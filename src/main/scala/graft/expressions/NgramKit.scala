package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram profile hit counter — bit-identical to the HOF
  * formulation in [[graft.operators.TextOps.ngramLangScoresHof]]
  * (char n-grams at every code-point position, count per language
  * profile how many grams are members), but ONE pass over the text for
  * ALL profiles. The HOF shape re-evaluates the whole gram array once
  * per profile (CollapseProject re-inlines it into each `filter`) and
  * each gram is an O(position) substring seek — O(profiles * len^2)
  * per document.
  *
  * Returns array<bigint> of length profiles.size + 1:
  * [0] = total gram count (max(len - n + 1, 0)), [i+1] = profile i hits.
  */
case class NgramProfileCounts(
    child: Expression,
    n: Int,
    profiles: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_profile_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && profiles.nonEmpty &&
        profiles.forall(_.forall(_.length == n)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "graft_ngram_profile_counts requires a string input, n > 0, and " +
        s"every profile gram of length n; got $t")
  }

  // gram -> indexes of the profiles containing it (a gram may appear in
  // several profiles; each gets the hit, matching the per-profile filters)
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case (ps, i) =>
      ps.foreach { g =>
        val prev = Option(m.get(g)).getOrElse(Array.empty[Int])
        if (!prev.contains(i)) m.put(g, prev :+ i)
      }
    }
    m
  }

  /** Called from generated code (via an object reference). */
  def counts(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.codePointCount(0, s.length)
    val out = new Array[Long](profiles.size + 1)
    if (len >= n) {
      out(0) = (len - n + 1).toLong
      var start = 0 // char (UTF-16) offset of the gram's first code point
      var i = 0
      while (i < len - n + 1) {
        val end = s.offsetByCodePoints(start, n)
        val hits = lookup.get(s.substring(start, end))
        if (hits != null) {
          var k = 0
          while (k < hits.length) { out(hits(k) + 1) += 1L; k += 1 }
        }
        start = s.offsetByCodePoints(start, 1)
        i += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  protected override def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramProfileCounts", this,
      classOf[NgramProfileCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramProfileCounts =
    copy(child = newChild)
}
