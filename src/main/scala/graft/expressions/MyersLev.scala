package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXACT Levenshtein distance via Myers' bit-parallel algorithm (Myers
  * 1999, with Hyyrö's edit-distance boundary): the full unit-cost DP
  * recurrence packed 64 cells per machine word, O(n·⌈m/64⌉) word ops
  * instead of O(n·m) cell ops — ~60× less work at the 2000-char refine
  * cap, which is what moves the unbounded verify stage (d11) from the
  * slowest query on the board into the pack WITHOUT changing a single
  * output value (the oracle stays DuckDB's own `levenshtein`).
  * Oracle caveat: DuckDB's `levenshtein` is BYTE-level ('éclair' vs
  * 'eclair' → 2) while this is code-point-level (→ 1, matching Spark),
  * so DuckDB parity holds only on ASCII payloads — which the synthetic
  * documents table is; a non-ASCII corpus needs a code-point-safe
  * oracle encoding instead.
  *
  * Semantics match Spark's `levenshtein` exactly: distance over UNICODE
  * CODE POINTS (not UTF-16 units), null if either side is null. The
  * shorter string is taken as the pattern, so the word count is
  * ⌈min/64⌉. [[graft.operators.DedupOps.editDistanceWithin]] remains
  * the cheaper choice when only "within k?" is needed; this is for when
  * the exact distance/similarity IS the output.
  */
case class MyersLev(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_myers_lev"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_myers_lev requires string arguments, got " +
          s"${left.dataType} and ${right.dataType}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    MyersLev.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.MyersLev.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MyersLev =
    copy(left = newLeft, right = newRight)
}

object MyersLev {

  /** Called from generated code. */
  def distance(a: UTF8String, b: UTF8String): Int =
    distanceCp(a.toString.codePoints().toArray,
      b.toString.codePoints().toArray)

  def distanceCp(x: Array[Int], y: Array[Int]): Int = {
    // pattern = the shorter side: fewer words per column
    val (p, t) = if (x.length <= y.length) (x, y) else (y, x)
    if (p.length == 0) return t.length
    if (p.length <= 64) singleWord(p, t) else multiWord(p, t)
  }

  /** m ≤ 64: the classic one-word kernel. Pv/Mv encode the DP column's
    * vertical +1/−1 deltas; `(ph << 1) | 1` is the edit-distance
    * boundary D[0][j] = j (a +1 horizontal carry into row 0 every
    * column — the piece the approximate-matching variant omits).
    */
  private def singleWord(p: Array[Int], t: Array[Int]): Int = {
    val m = p.length
    val peq = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    while (i < m) {
      val k = Integer.valueOf(p(i))
      val prev = peq.get(k)
      peq.put(k, java.lang.Long.valueOf(
        (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      i += 1
    }
    val high = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    var j = 0
    while (j < t.length) {
      val e = peq.get(Integer.valueOf(t(j)))
      val eq = if (e == null) 0L else e.longValue()
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & high) != 0L) score += 1
      else if ((mh & high) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** m > 64: Hyyrö's block version. Each column walks the ⌈m/64⌉ words
    * bottom-up propagating the horizontal delta h ∈ {−1, 0, +1}; the
    * score delta is the last word's h read at bit (m−1) mod 64. Junk
    * bits above m−1 in the last word never contaminate valid bits (the
    * add's carries only travel upward).
    */
  private def multiWord(p: Array[Int], t: Array[Int]): Int = {
    val m = p.length
    val w = (m + 63) >> 6
    val peq = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    while (i < m) {
      val k = Integer.valueOf(p(i))
      var arr = peq.get(k)
      if (arr == null) { arr = new Array[Long](w); peq.put(k, arr) }
      arr(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    val zeros = new Array[Long](w)
    val pv = Array.fill(w)(-1L)
    val mv = new Array[Long](w)
    // word b's horizontal-carry test bit: its own top row — bit 63 for
    // full words, bit (m−1) mod 64 for the final partial word
    val scoreBit = Array.tabulate(w)(b =>
      if (b == w - 1) 1L << ((m - 1) & 63) else 1L << 63)
    var score = m
    var j = 0
    while (j < t.length) {
      val e = peq.get(Integer.valueOf(t(j)))
      val eqs = if (e == null) zeros else e
      var h = 1 // D[0][j] − D[0][j−1] = +1: the edit-distance boundary
      var b = 0
      while (b < w) {
        var eq = eqs(b)
        val pvb = pv(b)
        val mvb = mv(b)
        val xv = eq | mvb
        if (h < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        var hout = 0
        if ((ph & scoreBit(b)) != 0L) hout = 1
        else if ((mh & scoreBit(b)) != 0L) hout = -1
        ph = ph << 1
        mh = mh << 1
        if (h > 0) ph |= 1L
        else if (h < 0) mh |= 1L
        pv(b) = mh | ~(xv | ph)
        mv(b) = ph & xv
        h = hout
        b += 1
      }
      score += h
      j += 1
    }
    score
  }
}
