package graft

import graft.operators.NmdbCatchup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NMDB incremental catch-up (nmdb/entrypoint.py:68-99): resume, 24h
  * clamp, stop-on-gap, seeded sequential validation.
  */
class NmdbCatchupSpec extends SparkSpec {

  private val H = 3600L * 1000L
  private val base = 1704067200L * 1000L // 2024-01-01 00:00:00 UTC millis

  test("planWindow resumes from last stored hour when within lookback") {
    val now = base + 60 * H
    assert(NmdbCatchup.planWindow(Some(now - 10 * H), None, now)
      === Some((now - 10 * H, now)))
  }

  test("planWindow clamps to now - 24h when further behind (>= comparison)") {
    val now = base + 60 * H
    assert(NmdbCatchup.planWindow(Some(now - 53 * H), None, now)
      === Some((now - 24 * H, now)))
    // exactly 24h behind: the reference's >= fires the clamp (a no-op here)
    assert(NmdbCatchup.planWindow(Some(now - 24 * H), None, now)
      === Some((now - 24 * H, now)))
  }

  test("planWindow falls back to the first raw timestamp, hour-truncated") {
    val now = base + 60 * H
    val raw = now - 5 * H + 23 * 60L * 1000L // 23 minutes past the hour
    assert(NmdbCatchup.planWindow(None, Some(raw), now)
      === Some((now - 5 * H, now)))
  }

  test("planWindow skips sites with no resume point or a future resume") {
    val now = base + 60 * H
    assert(NmdbCatchup.planWindow(None, None, now).isEmpty)
    assert(NmdbCatchup.planWindow(Some(now + H), None, now).isEmpty)
  }

  test("planHours is inclusive of both the resume hour and now") {
    val now = base + 3 * H
    assert(NmdbCatchup.planHours(Some(now - 2 * H), None, now)
      === Seq(now - 2 * H, now - H, now))
  }

  test("catchup walk stops at the first missing feed hour and flags drift") {
    import spark.implicits._
    def hourTs(h: Column) =
      timestamp_seconds(lit(1704067200L) + h.cast("long") * 3600L)
    val nowHour = timestamp_seconds(lit(1704067200L + 60L * 3600L))
    val store = Seq((0, 2), (1, 7), (2, 50)).toDF("site_no", "last_h")
      .select(col("site_no"), explode(sequence(lit(0), col("last_h"))).as("h"))
      .select(col("site_no"), hourTs(col("h")).as("time"),
        (lit(100.0) + col("site_no") + col("h") * lit(0.5)).as("intensity"),
        when(col("h") % 4 === 3, lit(1)).otherwise(lit(0)).as("bad_data_flag"))
    val raw = Seq((3, 1704067200L + 41L * 3600L + 23L * 60L))
      .toDF("site_no", "sec")
      .select(col("site_no"), timestamp_seconds(col("sec")).as("time"))
    val feed = Seq(0, 1, 2, 3).toDF("site_no")
      .select(col("site_no"), explode(sequence(lit(0), lit(60))).as("idx"))
      .filter(!(col("site_no") === 1 && col("idx") === 39))
      .select(col("site_no"), hourTs(col("idx")).as("time"),
        (lit(100.0) + col("site_no") +
          when(col("idx") % 9 === 7, lit(60.0))
            .otherwise((col("idx") % 3).cast("double"))).as("intensity"))

    val plan = NmdbCatchup.fetchPlan(store, raw, nowHour)
    val planRows = plan.groupBy("site_no")
      .agg(min("fetch_hour").as("lo"), max("fetch_hour").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) ->
        (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
      .toMap
    val now = base + 60 * H
    // sites 0 and 1 clamped to now-24h; site 2 resumes unclamped at its
    // last stored hour (Jan 3 02:00); site 3 from its first raw hour 17:00
    assert(planRows(0) === (now - 24 * H, now, 25L))
    assert(planRows(1) === (now - 24 * H, now, 25L))
    assert(planRows(2) === (base + 50 * H, now, 11L))
    assert(planRows(3) === (base + 41 * H, now, 20L))

    val out = NmdbCatchup.catchupAppend(store, feed, plan)
    val bySite = out.collect()
      .groupBy(_.getAs[Int]("site_no"))
      .view.mapValues(_.map(r =>
        (r.getAs[java.sql.Timestamp]("time").getTime,
          r.getAs[Double]("intensity"),
          r.getAs[Int]("bad_data_flag"))).sortBy(_._1)).toMap
    // site 1 stops at the gap: planned hours 36..60 but hour 39 missing
    // from the feed -> only 36, 37, 38 fetched
    assert(bySite(1).map(_._1) === Seq(base + 36 * H, base + 37 * H, base + 38 * H))
    // site 0 walks the full clamped window
    assert(bySite(0).size === 25)
    // spike hours (idx % 9 == 7: 43, 52) drift > 1.2x -> flagged, and the
    // following normal hour is valid again (the spike never becomes state)
    val s0 = bySite(0).map { case (t, _, f) => (t, f) }.toMap
    assert(s0(base + 43 * H) === 1 && s0(base + 52 * H) === 1)
    assert(s0(base + 44 * H) === 0)
    // site 2's first re-fetched hour is ratio-checked against its seed
    // (last valid stored row, 1h earlier) and passes
    assert(bySite(2).head === ((base + 50 * H, 104.0, 0)))
    // site 3 (no store, raw fallback) starts at 17:00 with no seed
    assert(bySite(3).head._1 === base + 41 * H)
    assert(bySite(3).size === 20)
  }
}
