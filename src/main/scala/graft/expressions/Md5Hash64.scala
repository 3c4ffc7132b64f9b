package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit content hash: the value of the first 15 hex digits of
  * md5(input) — bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)`
  * but computed straight from the digest bytes, skipping the 32-char hex
  * string materialization and the string base conversion (3 allocations
  * per call in the built-in formulation). Participates in whole-stage
  * codegen via a static helper, so it pipelines like any built-in.
  *
  * This is the hot inner hash of the MinHash/fingerprint family
  * (TextOps.baseHash60) — at corpus scale it runs once per shingle, i.e.
  * billions of times per table pass.
  */
case class Md5Hash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5hash64 requires a string argument, got ${child.dataType}")
  override def prettyName: String = "graft_md5hash64"

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Hash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {
  /** First 15 hex digits of md5 as a long: big-endian value of the first
    * 8 digest bytes, dropped low nibble. Called from generated code.
    */
  def hash(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes)
    val v =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v >>> 4
  }
}
