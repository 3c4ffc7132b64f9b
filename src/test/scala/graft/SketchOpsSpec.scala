package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** KMV sketches: lossless merge (sketch of a union == merged per-part
  * sketches — the distributed-rollup algebra), exactness below k,
  * estimator accuracy on a real column, and guards.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("merging per-part sketches equals the sketch of the whole — the " +
    "rollup algebra — and estimates match either way") {
    val ev = Tables(spark, dir, "events")
    val k = 16
    val whole = SketchOps.kmvSketch(ev, Seq("event_type"), "event_id", k)
    val parts = SketchOps.kmvSketch(
      ev.filter($"event_id" % 2 === 0), Seq("event_type"), "event_id", k)
      .union(SketchOps.kmvSketch(
        ev.filter($"event_id" % 2 === 1), Seq("event_type"), "event_id", k))
    val merged = SketchOps.kmvMerge(parts, Seq("event_type"), k)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type", $"kmv").as[(String, Seq[Long])]
        .collect().sortBy(_._1).toSeq
    assert(rows(merged) === rows(whole))
  }

  test("below k distinct values the sketch is exhaustive and the " +
    "estimate is exact; above k it lands within KMV error bounds") {
    val small = Seq.tabulate(40)(i => (i.toLong % 5, i.toLong))
      .toDF("g", "v")
    // 8 distinct v per group, k=16 -> exact
    val exact = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(small, Seq("g"), "v", 16), Seq("g"), 16)
      .select($"g", $"n_retained", $"n_distinct_est")
      .as[(Long, Int, Double)].collect()
    assert(exact.length === 5)
    assert(exact.forall { case (_, n, e) => n === 8 && e === 8.0 })
    // real column: 1000 distinct event_ids, k=64 -> σ ≈ 1/√62 ≈ 12.7%;
    // the hash is deterministic so this is a fixed number, asserted at
    // a generous 3σ
    val ev = Tables(spark, dir, "events")
    val est = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(ev, Seq(), "event_id", 64), Seq(), 64)
      .select($"n_distinct_est").as[Double].head()
    val n = ev.select($"event_id").distinct().count().toDouble
    assert(math.abs(est - n) / n < 0.38, s"est $est vs exact $n")
  }

  test("guards: k below 2 and reserved columns fail fast") {
    val df = Seq((1L, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      SketchOps.kmvSketch(df, Seq("g"), "v", 1)
    }
    intercept[IllegalArgumentException] {
      SketchOps.kmvSketch(df.withColumn("__h", lit(1)), Seq("g"), "v", 4)
    }
  }
}
