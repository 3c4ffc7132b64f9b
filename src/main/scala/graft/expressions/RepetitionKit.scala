package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All repetition-signal counts in ONE pass over a token array:
  * `struct(n_tok, top_word, top_word_cnt, top_bigram, top_bigram_cnt,
  * n_bigrams, n_trigrams, distinct_trigrams)`. Modal grams tie to the
  * binary-smallest string; word k-grams join with a single space
  * (identical to [[graft.operators.TextOps.shingles]]); empty gram sets
  * yield ("", 0).
  *
  * Why one kit instead of per-signal expressions: the signals share the
  * token scan, and Catalyst's CollapseProject re-inlines a projected
  * expression into every consumer — five separate columns (or five
  * field accesses on one expression) evaluate the whole pass five
  * times, rebuilding the shingle arrays each time. Callers evaluate
  * this ONCE behind a Generate barrier (`explode(array(kit))`), then
  * read fields from the materialized struct; the HOF/groupBy twin
  * ([[graft.operators.TextOps.repetitionSignalsShuffled]]) is the
  * equivalence-tested spec.
  */
case class RepetitionKit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionKit.schema
  override def prettyName: String = "graft_repetition_kit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_kit requires array<string>, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    RepetitionKit.counts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RepetitionKit.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionKit =
    copy(child = newChild)
}

object RepetitionKit {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("top_word", StringType, nullable = false),
    StructField("top_word_cnt", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_trigrams", IntegerType, nullable = false),
    StructField("distinct_trigrams", IntegerType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  private def modalOf(m: java.util.HashMap[UTF8String, Long])
      : (UTF8String, Long) = {
    var bestG: UTF8String = UTF8String.EMPTY_UTF8
    var bestC = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && bestC > 0 && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey
        bestC = c
      }
    }
    (bestG, bestC)
  }

  /** Called from generated code. Null tokens are skipped in counts but
    * keep their position (split() never produces them anyway).
    */
  def counts(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val words = new java.util.HashMap[UTF8String, Long]()
    val bigrams = new java.util.HashMap[UTF8String, Long]()
    val trigrams = new java.util.HashMap[UTF8String, Long]()
    i = 0
    while (i < n) {
      val a = toks(i)
      if (a != null) words.merge(a, 1L, (x, y) => x + y)
      if (i + 1 < n && a != null && toks(i + 1) != null) {
        bigrams.merge(UTF8String.concat(a, Space, toks(i + 1)), 1L,
          (x, y) => x + y)
      }
      if (i + 2 < n && a != null && toks(i + 1) != null && toks(i + 2) != null) {
        trigrams.merge(
          UTF8String.concat(a, Space, toks(i + 1), Space, toks(i + 2)), 1L,
          (x, y) => x + y)
      }
      i += 1
    }
    val (tw, twc) = modalOf(words)
    val (tb, tbc) = modalOf(bigrams)
    def total(m: java.util.HashMap[UTF8String, Long]): Int = {
      var s = 0L
      val it = m.values().iterator()
      while (it.hasNext) s += it.next()
      s.toInt
    }
    InternalRow(n, tw.clone(), twc, tb.clone(), tbc,
      total(bigrams), total(trigrams), trigrams.size())
  }
}
