package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan,
  LessThanOrEqual, Levenshtein, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded comparison against an UNBOUNDED
  * `levenshtein(a, b)` is rewritten to the BANDED form
  * `levenshtein(a, b, k) >= 0` — Ukkonen's O(k·min(|a|,|b|)) band
  * instead of the full O(|a|·|b|) DP, with identical results (the
  * 3-arg form returns the distance when it is <= k and -1 otherwise,
  * so `banded >= 0  <=>  distance <= k`; both forms propagate null
  * identically).
  *
  * This is the optimization a user cannot be expected to hand-write in
  * every ad-hoc query: record-linkage SQL is naturally phrased as
  * `WHERE levenshtein(a, b) <= 3`, which computes the full DP for
  * every pair only to compare the result — at corpus scale a ~100×
  * compute tax on the refine stage (see SCALE.md on d11 vs d15). The
  * rule makes the cheap form the PLAN'S property instead of the query
  * author's discipline. Registered by [[graft.GraftExtensions]];
  * rewrites only when the bound is a foldable non-negative int literal
  * (post-constant-folding, the common case).
  *
  * All eight literal-comparison shapes band: <=, <, >=, > with the
  * literal on either side (complements via the banded form's -1
  * sentinel: `lev > k` becomes `levenshtein(a,b,k) < 0`). The
  * trivially-true `lev >= 0` conjunct that SQL's BETWEEN desugars into
  * collapses to null checks — only as a TOP-LEVEL conjunct of a Filter
  * condition, the one position where null and false coincide. Deeper
  * in the condition tree they do not: under `NOT(...)` a null input
  * yields NOT(null)=null (row dropped) while NOT(false)=true (row
  * kept), and under `IS NULL` / CASE the substitution changes the
  * value outright — so nested occurrences are left alone (ADVICE r11).
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k))), Literal(0))

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  /** Distance exceeds k: `levenshtein(a, b, k) < 0` (the banded form's
    * -1 sentinel; null propagates like the unbounded comparison).
    */
  private def bandedOver(a: Expression, b: Expression, k: Int): Expression =
    LessThan(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rewritten = plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), r)
          if intLit(r).exists(_ >= 0) =>
        banded(a, b, intLit(r).get)
      case GreaterThanOrEqual(l, Levenshtein(a, b, None))
          if intLit(l).exists(_ >= 0) =>
        banded(a, b, intLit(l).get)
      // lev(a,b) < k  /  k > lev(a,b)   (k >= 1: band at k-1)
      case LessThan(Levenshtein(a, b, None), r)
          if intLit(r).exists(_ >= 1) =>
        banded(a, b, intLit(r).get - 1)
      case GreaterThan(l, Levenshtein(a, b, None))
          if intLit(l).exists(_ >= 1) =>
        banded(a, b, intLit(l).get - 1)
      // complements: lev(a,b) > k / k < lev(a,b) / lev(a,b) >= k (k>=1)
      case GreaterThan(Levenshtein(a, b, None), r)
          if intLit(r).exists(_ >= 0) =>
        bandedOver(a, b, intLit(r).get)
      case LessThan(l, Levenshtein(a, b, None))
          if intLit(l).exists(_ >= 0) =>
        bandedOver(a, b, intLit(l).get)
      case GreaterThanOrEqual(Levenshtein(a, b, None), r)
          if intLit(r).exists(_ >= 1) =>
        bandedOver(a, b, intLit(r).get - 1)
      case LessThanOrEqual(l, Levenshtein(a, b, None))
          if intLit(l).exists(_ >= 1) =>
        bandedOver(a, b, intLit(l).get - 1)
    }
    // FILTER-only, TOP-LEVEL-CONJUNCT-only: `lev(a,b) >= 0` (the left
    // conjunct SQL's BETWEEN desugars to) is true whenever both inputs
    // are non-null and null otherwise — as a conjunct of a filter
    // condition, null and false coincide, so the full DP collapses to
    // two null checks. NOT valid in a projection (there null-in must
    // stay null-out) nor under NOT/IS NULL/CASE inside the condition
    // (null and false diverge there), hence splitConjunctivePredicates
    // rather than a depth-arbitrary transform.
    rewritten.transform {
      case f: Filter =>
        val conjuncts = splitConjunctivePredicates(f.condition)
        val collapsed = conjuncts.map {
          case GreaterThanOrEqual(Levenshtein(a, b, None), r)
              if intLit(r).exists(_ <= 0) =>
            And(IsNotNull(a), IsNotNull(b))
          case LessThanOrEqual(l, Levenshtein(a, b, None))
              if intLit(l).exists(_ <= 0) =>
            And(IsNotNull(a), IsNotNull(b))
          case other => other
        }
        if (collapsed == conjuncts) f
        else f.copy(condition = collapsed.reduce(And))
    }
  }
}
