package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injected optimizer rule must rewrite thresholded full-DP
  * levenshtein comparisons into the banded form — same rows, cheaper
  * plan — and must leave non-rewritable shapes alone.
  */
class BandedLevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  // file-backed (a LocalRelation filter is folded away at optimize
  // time, which would hide the rewrite from the plan)
  private lazy val pairsPath: String = {
    val d = tempDirFile("graft_lev_")
    d.deleteOnExit()
    Seq(
      ("kitten", "sitting"),   // distance 3
      ("kitten", "kitten"),    // 0
      ("abcdef", "zzzzzz"),    // 6
      ("x", null))             // null -> comparison null -> dropped
      .toDF("a", "b")
      .write.mode("overwrite").parquet(d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def pairs: DataFrame = spark.read.parquet(pairsPath)

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("lev <= k, k >= lev, lev < k, k > lev all rewrite to the banded " +
    "form and keep their rows") {
    val le = pairs.filter("levenshtein(a, b) <= 3")
    assert(optimized(le).contains("levenshtein(a#"), optimized(le))
    assert(optimized(le).contains("Some(3)) >= 0"), optimized(le))
    assert(le.select($"a").as[String].collect().sorted.toSeq ===
      Seq("kitten", "kitten"))

    val ge = pairs.filter("3 >= levenshtein(a, b)")
    assert(optimized(ge).contains("Some(3)) >= 0"), optimized(ge))
    assert(ge.count() === 2)

    // strict: lev < 4 bands at 3
    val lt = pairs.filter("levenshtein(a, b) < 4")
    assert(optimized(lt).contains("Some(3)) >= 0"), optimized(lt))
    assert(lt.count() === 2)
    val gt = pairs.filter("6 > levenshtein(a, b)")
    assert(optimized(gt).contains("Some(5)) >= 0"), optimized(gt))
    assert(gt.count() === 2)
  }

  test("complement shapes band via the -1 sentinel, and BETWEEN leaves " +
    "NO full-DP levenshtein in the plan") {
    val gt = pairs.filter("levenshtein(a, b) > 3")
    assert(optimized(gt).contains("Some(3)) < 0"), optimized(gt))
    assert(gt.select($"a").as[String].collect().toSeq === Seq("abcdef"))
    val ge = pairs.filter("levenshtein(a, b) >= 4")
    assert(optimized(ge).contains("Some(3)) < 0"), optimized(ge))
    assert(ge.count() === 1)
    val flip = pairs.filter("3 < levenshtein(a, b)")
    assert(optimized(flip).contains("Some(3)) < 0"), optimized(flip))
    assert(flip.count() === 1)

    // the BETWEEN desugaring: lev >= 0 AND lev <= 3 — the left conjunct
    // must collapse to null checks, never survive as a full DP
    val btw = pairs.filter("levenshtein(a, b) BETWEEN 0 AND 3")
    val plan = optimized(btw)
    assert(plan.contains("Some(3)) >= 0"), plan)
    assert("levenshtein\\(a#\\d+, b#\\d+\\)".r.findFirstIn(plan).isEmpty,
      s"full-DP levenshtein survived:\n$plan")
    assert(btw.count() === 2)
    // null inputs still drop (IsNotNull carries the null semantics)
    assert(pairs.filter("levenshtein(a, b) BETWEEN 0 AND 99").count() === 3)
  }

  test("non-rewritable shapes are left alone: negative bound, " +
    "non-literal bound, equality, already-banded") {
    val neg = pairs.filter("levenshtein(a, b) <= -1")
    assert(!optimized(neg).contains(">= 0"), optimized(neg))
    assert(neg.count() === 0)

    val dyn = pairs.filter("levenshtein(a, b) <= length(a)")
    assert(!optimized(dyn).contains("-1"), optimized(dyn))
    assert(dyn.count() === 3) // 0<=6, 3<=7, and abcdef/zzzzzz: 6<=6

    val eq = pairs.filter("levenshtein(a, b) = 3")
    assert(eq.count() === 1)

    val pre = pairs.filter("levenshtein(a, b, 3) >= 0")
    assert(pre.count() === 2) // idempotent: no double-rewrite blowup
  }

  test("null-check collapse fires ONLY on top-level conjuncts — under " +
    "NOT / IS NULL / CASE, null and false diverge and the DP must stay") {
    // NOT(lev >= 0): null input row gives NOT(null)=null (dropped);
    // a naive collapse to NOT(a nn AND b nn) would KEEP it. Non-null
    // rows always satisfy lev >= 0, so the correct answer is 0 rows.
    val not = pairs.filter("NOT (levenshtein(a, b) >= 0)")
    assert(not.count() === 0,
      "NOT(lev >= 0) must drop every row (null comparison stays null)")
    assert(optimized(not).contains("levenshtein"),
      s"collapse fired under NOT:\n${optimized(not)}")

    // (lev >= 0) IS NULL: true exactly for the null-input row
    val isNull = pairs.filter("(levenshtein(a, b) >= 0) IS NULL")
    assert(isNull.count() === 1, "IS NULL must keep only the null row")

    // CASE over the predicate: the null-input row takes no THEN branch
    // (WHEN null = no match), falls to ELSE true, and is KEPT; the
    // three non-null rows hit THEN false and drop
    val cse = pairs.filter(
      "CASE WHEN levenshtein(a, b) >= 0 THEN false ELSE true END")
    assert(cse.count() === 1,
      "only the null-input row falls through to ELSE true")

    // as a top-level conjunct the collapse still fires and null rows drop
    val conj = pairs.filter("levenshtein(a, b) >= 0 AND a IS NOT NULL")
    assert(conj.count() === 3)
    assert(!optimized(conj).contains("levenshtein"),
      s"top-level conjunct did not collapse:\n${optimized(conj)}")
  }
}
