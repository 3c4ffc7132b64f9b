package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 1-permutation MinHash over token shingles — bit-identical to
  * `array_min(transform(shingles(toks, k), s => md5(s)))` with
  * `shingles = array_join(slice(toks, i, k), " ")` (see
  * [[graft.operators.TextOps.fingerprint]]), but one pass that never
  * materializes the shingle-string array or the md5-hex array: each
  * shingle is built, digested, and folded into a running 16-byte min.
  * Hex strings compare lexicographically exactly as their digest bytes
  * compare unsigned, so the min is tracked on the raw digests and
  * rendered once.
  *
  * Null tokens are omitted from the joined shingle (array_join
  * semantics). Returns null when fewer than k tokens exist (array_min
  * over an empty array).
  */
case class MinShingleMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_shingle_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_min_shingle_md5 requires array<string> and k > 0, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    MinShingleMd5.minShingleMd5(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.MinShingleMd5.minShingleMd5($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {
  private val HexChars = "0123456789abcdef".toCharArray

  /** Called from generated code; null when size(toks) < k. */
  def minShingleMd5(toks: ArrayData, k: Int): UTF8String = {
    val n = toks.numElements()
    if (n < k) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < k) {
        if (!toks.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = HexChars((min(b) & 0xf0) >> 4)
      hex(2 * b + 1) = HexChars(min(b) & 0x0f)
      b += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}
