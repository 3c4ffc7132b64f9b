package graft

import graft.operators.LevelPipeline
import graft.operators.LevelPipeline.Station
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew behavior (SCALE.md §2): one hot site holding ~90% of all rows.
  *
  * The pipeline's windows partition by site_no, so a hot site serializes
  * into one task per window stage; the joins are broadcast (dims) or
  * partial-aggregable, so AQE's skew handling covers the shuffle joins.
  * What is pinnable at test scale: with AQE + skew-join handling ON, the
  * skewed fleet run COMPLETES and the hot site's rows are BIT-IDENTICAL
  * to running that site alone — i.e. skew never changes results, only
  * task balance, and the per-site window math is partition-invariant.
  * (The wall-clock effect of AQE skew splitting needs >256 MB partitions
  * to trigger — cluster-scale, not unit-test scale; the structural bound
  * on a hot site is the incremental runner's recompute window, which caps
  * any site's rows per run at window-days x cadence.)
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  private def hourly(site: Int, hours: Int): DataFrame =
    spark.range(hours.toLong).toDF("h")
      .select(lit(site).as("site_no"),
        timestamp_seconds(lit(1704067200L) + col("h") * 3600L).as("time"),
        // count varies mildly so lag/dedup/flag rules all engage without
        // tripping the 20% jump flag
        (lit(100L) + pmod(col("h"), lit(5)).cast("long")).as("count"),
        lit(12.0).as("battery"), lit(1000.0).as("pressure1"),
        lit(1005.0).as("pressure2"), lit(20.0).as("external_temperature"),
        lit(50.0).as("external_humidity"), lit(0.0).as("rain"),
        lit(20.0).as("internal_temperature"), lit(30.0).as("internal_humidity"),
        lit(21.0).as("tube_temperature"), lit(31.0).as("tube_humidity"),
        lit(0.1).as("vwc1"), lit(0.2).as("vwc2"), lit(0.3).as("vwc3"),
        lit(0).as("flag"))

  private def siloFor(raw: DataFrame): DataFrame =
    raw.select(col("site_no"), date_trunc("day", col("time")).as("day"))
      .distinct()
      .select(col("site_no"),
        (col("day") + expr("INTERVAL 8 HOURS")).as("time"),
        lit(10.0).as("average_temperature"), lit(60.0).as("average_humidity"))

  private def intensityFor(raw: DataFrame): DataFrame =
    raw.select(col("site_no"), col("time"), lit(130.0).as("intensity"))

  test("90%-hot-site fleet run matches the hot site run in isolation " +
    "(AQE skew handling on)") {
    val conf = spark.conf
    val prevAdaptive = conf.get("spark.sql.adaptive.enabled", "true")
    val prevSkew = conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      val hot = hourly(1, 720) // 30 days, ~91% of the fleet's rows
      val cold = hourly(2, 72) // 3 days
      val fleet = hot.unionByName(cold)
      val stations = Seq(
        Station(1, 0.01, 1000.0, 100.0, 1.0, 1.0, 100.0, 1.0, 0.05, 0.05),
        Station(2, 0.01, 1000.0, 100.0, 1.0, 1.0, 100.0, 1.0, 0.05, 0.05))
        .toDF()
      def run(raw: DataFrame): DataFrame =
        LevelPipeline.processLevels(
          raw, stations, siloFor(raw), intensityFor(raw))

      val fleetOut = run(fleet)
      val hotIsolated = run(hot)

      def key(df: DataFrame): Set[(Int, Long, Double, Double)] =
        df.select(col("site_no"), col("time").cast("long"),
          round(col("soil_moist_filtered"), 9), round(col("depth_filtered"), 9))
          .as[(Int, Long, Double, Double)].collect().toSet

      val fleetHot = key(fleetOut.filter(col("site_no") === 1))
      val isolated = key(hotIsolated)
      assert(fleetHot.nonEmpty)
      assert(fleetHot === isolated,
        "hot-site results must be invariant to the rest of the fleet")
      // the cold site is present and unharmed too
      assert(fleetOut.filter(col("site_no") === 2).count() > 0)
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAdaptive)
      conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
    }
  }
}
