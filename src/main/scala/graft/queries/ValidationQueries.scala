package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.{IntensityOps, NmdbCatchup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E11 — stateful intensity validation: ±20% drift vs the previous VALID
  * point with a 24h gap bypass (`nmdb/entrypoint.py:122-134`). Sequential
  * state (invalid points don't advance the reference), so the Spark side
  * is a secondary-sort mapPartitions fold and the DuckDB oracle a
  * recursive CTE stepping through per-site row numbers.
  */
object ValidationQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, Q] = Map(
    "e11_intensity_validation" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), coalesce(col("value"), lit(0.0)).as("v"))
        // Deterministic hourly series per site with ±20% spikes (every
        // 23rd event triples) and >24h gaps (every 50th step jumps 30h).
        val series = ev.select(
          (col("event_id") % 5).cast("int").as("site_no"),
          floor(col("event_id") / 5).cast("long").as("seq"),
          col("event_id"), col("v"))
          .withColumn("time", timestamp_seconds(
            lit(1704067200L) +
              (col("seq") + lit(30) * floor(col("seq") / 50)) * 3600))
          .withColumn("intensity",
            when(col("event_id") % 23 === 0,
              (lit(100.0) + col("v")) * 3).otherwise(lit(100.0) + col("v")))
          .select("site_no", "time", "intensity")
        IntensityOps.flagDrift(series)
          .toDF()
          .select(col("site_no"), col("time"),
            round(col("intensity"), 6).as("intensity"), col("bad_data_flag"))
          .orderBy(col("site_no"), col("time"))
      },
      oracle = Some("""
        WITH RECURSIVE series AS (
          SELECT CAST(event_id % 5 AS INT) AS site_no,
                 TIMESTAMP '2024-01-01 00:00:00' +
                   ((CAST(floor(event_id / 5) AS BIGINT)
                     + 30 * CAST(floor(CAST(floor(event_id / 5) AS BIGINT) / 50) AS BIGINT))
                    * 3600) * INTERVAL 1 SECOND AS time,
                 CASE WHEN event_id % 23 = 0
                      THEN (100.0 + coalesce(value, 0.0)) * 3
                      ELSE 100.0 + coalesce(value, 0.0) END AS intensity
          FROM events),
        numbered AS (
          SELECT *, row_number() OVER (PARTITION BY site_no ORDER BY time) AS rn
          FROM series),
        rec AS (
          SELECT site_no, rn, time, intensity,
                 0 AS bad_data_flag,
                 CAST(floor(epoch(time)) AS BIGINT) AS lv_epoch,
                 intensity AS lv_val
          FROM numbered WHERE rn = 1
          UNION ALL
          SELECT n.site_no, n.rn, n.time, n.intensity,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN 1 ELSE 0 END AS bad_data_flag,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN r.lv_epoch
                      ELSE CAST(floor(epoch(n.time)) AS BIGINT) END AS lv_epoch,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN r.lv_val
                      ELSE n.intensity END AS lv_val
          FROM rec r
          JOIN numbered n ON n.site_no = r.site_no AND n.rn = r.rn + 1)
        SELECT site_no, time, round(intensity, 6) AS intensity, bad_data_flag
        FROM rec
        ORDER BY site_no, time""")),

    // S14 — NMDB incremental catch-up (nmdb/entrypoint.py:68-99): per-site
    // resume from last stored intensity hour (else first raw hour), 24h
    // lookback clamp, hour-by-hour walk that STOPS at the first missing
    // source hour, sequential ±20% validation, append. The synthetic fleet
    // exercises every branch: site 0/1 clamped (>24h behind), site 1 hits
    // a feed gap 3 hours in, site 2 resumes unclamped (10h behind,
    // inclusive re-fetch of the resume hour, ratio-checked vs its seed),
    // site 3 has no stored intensity and resumes from its first raw hour.
    "s14_nmdb_catchup" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val base = 1704067200L // 2024-01-01 00:00:00 UTC
        def hourTs(h: Column) =
          timestamp_seconds(lit(base) + h.cast("long") * 3600L)
        val nowHour = timestamp_seconds(lit(base + 60L * 3600L)) // Jan 3 12:00
        // Stored intensity: sites 0..2 with hourly rows 0..last_h; every
        // 4th row is flagged bad (exercises the valid-seed filter).
        val store = Seq((0, 2), (1, 7), (2, 50)).toDF("site_no", "last_h")
          .select(col("site_no"),
            explode(sequence(lit(0), col("last_h"))).as("h"))
          .select(col("site_no"), hourTs(col("h")).as("time"),
            (lit(100.0) + col("site_no") + col("h") * lit(0.5)).as("intensity"),
            when(col("h") % 4 === 3, lit(1)).otherwise(lit(0))
              .as("bad_data_flag"))
        // Raw rows: site 3 only (the first-raw resume fallback; 17:23 on
        // Jan 2 truncates to 17:00, 19h before now -> unclamped).
        val raw = Seq((3, base + 41L * 3600L + 23L * 60L)).toDF("site_no", "sec")
          .select(col("site_no"), timestamp_seconds(col("sec")).as("time"))
        // Hourly source feed for all sites; site 1 is missing hour 39
        // (gap-stop) and every 9th hour spikes +60 (trips the 1.2x rule).
        val feed = Seq(0, 1, 2, 3).toDF("site_no")
          .select(col("site_no"), explode(sequence(lit(0), lit(60))).as("idx"))
          .filter(!(col("site_no") === 1 && col("idx") === 39))
          .select(col("site_no"), hourTs(col("idx")).as("time"),
            (lit(100.0) + col("site_no") +
              when(col("idx") % 9 === 7, lit(60.0))
                .otherwise((col("idx") % 3).cast("double"))).as("intensity"))
        val plan = NmdbCatchup.fetchPlan(store, raw, nowHour)
        NmdbCatchup.catchupAppend(store, feed, plan)
          .select(col("site_no"), col("time"),
            round(col("intensity"), 6).as("intensity"), col("bad_data_flag"))
          .orderBy(col("site_no"), col("time"))
      },
      oracle = Some("""
        WITH RECURSIVE
        store AS (
          SELECT site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + CAST(h AS BIGINT) * INTERVAL 1 HOUR AS time,
                 100.0 + site_no + h * 0.5 AS intensity,
                 CASE WHEN h % 4 = 3 THEN 1 ELSE 0 END AS bad_data_flag
          FROM (SELECT site_no, unnest(generate_series(0, last_h)) AS h
                FROM (VALUES (0, 2), (1, 7), (2, 50)) AS s(site_no, last_h))),
        resume AS (
          SELECT site_no, max(time) AS resume FROM store GROUP BY 1
          UNION ALL
          SELECT 3 AS site_no, TIMESTAMP '2024-01-02 17:00:00' AS resume),
        plan0 AS (
          SELECT site_no,
                 CASE WHEN resume <= TIMESTAMP '2024-01-02 12:00:00'
                      THEN TIMESTAMP '2024-01-02 12:00:00'
                      ELSE resume END AS start_hour
          FROM resume
          WHERE resume <= TIMESTAMP '2024-01-03 12:00:00'),
        plan AS (
          SELECT site_no, start_hour,
                 unnest(generate_series(start_hour,
                   TIMESTAMP '2024-01-03 12:00:00', INTERVAL 1 HOUR)) AS fetch_hour
          FROM plan0),
        feed AS (
          SELECT site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + CAST(idx AS BIGINT) * INTERVAL 1 HOUR AS time,
                 100.0 + site_no + CASE WHEN idx % 9 = 7 THEN 60.0
                                        ELSE CAST(idx % 3 AS DOUBLE) END AS intensity
          FROM (SELECT site_no, unnest(generate_series(0, 60)) AS idx
                FROM (VALUES (0), (1), (2), (3)) AS s(site_no))
          WHERE NOT (site_no = 1 AND idx = 39)),
        walk AS (
          SELECT p.site_no, p.fetch_hour, f.intensity,
                 sum(CASE WHEN f.intensity IS NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY p.site_no ORDER BY p.fetch_hour) AS miss
          FROM plan p LEFT JOIN feed f
            ON f.site_no = p.site_no AND f.time = p.fetch_hour),
        fetched AS (
          SELECT site_no, fetch_hour AS time, intensity FROM walk WHERE miss = 0),
        seedpick AS (
          SELECT s.site_no, max(s.time) AS time
          FROM store s JOIN plan0 p USING (site_no)
          WHERE s.bad_data_flag = 0 AND s.time < p.start_hour
          GROUP BY 1),
        seeds AS (
          SELECT s.site_no, s.time, s.intensity
          FROM store s JOIN seedpick k ON s.site_no = k.site_no AND s.time = k.time),
        numbered AS (
          SELECT *, row_number() OVER (PARTITION BY site_no ORDER BY time) AS rn
          FROM (SELECT * FROM seeds UNION ALL SELECT * FROM fetched)),
        rec AS (
          SELECT site_no, rn, time, intensity,
                 0 AS bad_data_flag,
                 CAST(floor(epoch(time)) AS BIGINT) AS lv_epoch,
                 intensity AS lv_val
          FROM numbered WHERE rn = 1
          UNION ALL
          SELECT n.site_no, n.rn, n.time, n.intensity,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN 1 ELSE 0 END AS bad_data_flag,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN r.lv_epoch
                      ELSE CAST(floor(epoch(n.time)) AS BIGINT) END AS lv_epoch,
                 CASE WHEN (CAST(floor(epoch(n.time)) AS BIGINT) - r.lv_epoch) <= 86400
                       AND (n.intensity < 0.8 * r.lv_val
                            OR n.intensity > 1.2 * r.lv_val)
                      THEN r.lv_val
                      ELSE n.intensity END AS lv_val
          FROM rec r
          JOIN numbered n ON n.site_no = r.site_no AND n.rn = r.rn + 1)
        SELECT r.site_no, r.time, round(r.intensity, 6) AS intensity,
               r.bad_data_flag
        FROM rec r JOIN plan0 p USING (site_no)
        WHERE r.time >= p.start_hour
        ORDER BY site_no, time"""))
  )
}
