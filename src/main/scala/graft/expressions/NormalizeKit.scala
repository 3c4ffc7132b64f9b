package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the canonical
  * pre-hash step of every text-dedup pipeline: "café" composed
  * (U+00E9) and decomposed (U+0065 U+0301) are byte-different strings
  * that hash apart, survive exact dedup apart, and land in different
  * MinHash buckets unless every document normalizes FIRST. The JVM's
  * `java.text.Normalizer` implements the Unicode-conformance NFC
  * algorithm, so results agree byte for byte with any conformant
  * engine (DuckDB's `nfc_normalize` is the oracle's implementation).
  *
  * The fast path costs one scan: `Normalizer.isNormalized` is a cheap
  * quick-check pass, and real-world corpora are overwhelmingly already
  * NFC — only strings containing decomposed sequences pay the
  * normalize-and-reallocate. Map-side, codegen'd, no shuffle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc_normalize requires a string argument, got ${child.dataType}")

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
