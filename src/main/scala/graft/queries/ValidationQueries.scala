package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.IntensityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
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
        ORDER BY site_no, time"""))
  )
}
