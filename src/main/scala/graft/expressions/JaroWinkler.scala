package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) over UTF-8 BYTES — the
  * record-linkage scorer that complements the edit-distance family
  * ([[MyersLev]] counts edits; this weighs matches, transpositions and
  * a shared prefix) for short identifier-like strings where insertions
  * near the front matter more than near the end.
  *
  * Semantics are pinned to the conventional reference implementation
  * (and verified cell-by-cell against DuckDB's
  * `jaro_winkler_similarity`, which this library's oracle gate uses):
  *   - operates on raw UTF-8 bytes, NOT code points (multi-byte
  *     characters count per byte — probed: 'éclair'/'eclair' →
  *     0.849206… = the byte-length formula);
  *   - either side empty → 0.0 (including both empty);
  *   - match window = max(len)/2 − 1, floored at 0;
  *   - transpositions = ⌊mismatched-match-positions / 2⌋ (integer
  *     floor — probed via odd-mismatch 3-cycles);
  *   - Winkler prefix boost (weight 0.1, prefix capped at 4 bytes)
  *     applies only when the Jaro base exceeds 0.7.
  *
  * O(len_a · window) time, two small stack bitsets — no allocation
  * beyond two byte arrays; stays inside whole-stage codegen via a
  * static call, like Spark's own `levenshtein`.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires string arguments, got " +
          s"${left.dataType} and ${right.dataType}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Called from generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.getBytes, b.getBytes)

  def jaroWinkler(x: Array[Byte], y: Array[Byte]): Double = {
    val j = jaro(x, y)
    if (j > 0.7) {
      val cap = math.min(4, math.min(x.length, y.length))
      var l = 0
      while (l < cap && x(l) == y(l)) l += 1
      // same association order as the reference: (l * 0.1) * (1 - j)
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  def jaro(x: Array[Byte], y: Array[Byte]): Double = {
    val n1 = x.length
    val n2 = y.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val xFlag = new Array[Boolean](n1)
    val yFlag = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var k = lo
      var done = false
      while (k <= hi && !done) {
        if (!yFlag(k) && y(k) == x(i)) {
          xFlag(i) = true
          yFlag(k) = true
          m += 1
          done = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatched positions between the two matched subsequences
    var mism = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (xFlag(i)) {
        while (!yFlag(k)) k += 1
        if (x(i) != y(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2 // integer floor — the probed convention
    val md = m.toDouble
    (md / n1 + md / n2 + (md - t) / md) / 3.0
  }
}
