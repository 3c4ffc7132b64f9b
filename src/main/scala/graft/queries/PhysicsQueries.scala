package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's scalar-expression layer — SURVEY.md §2.6 (E1-E13) and the
  * NMDB ASCII source (S5) — exercised over events-derived columns so each
  * branch (zero sentinels, fallback chains, flag rules) is covered by the
  * DuckDB oracle. All pure `Column` expressions: zero UDFs, fully inside
  * whole-stage codegen.
  */
object PhysicsQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** wv-correction kernel (pipeline/cosmoz_process_levels.py:224-225). */
  private def wvCorr(tC: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
    lit(1.0) + lit(0.0054) *
      ((lit(2165.0) * ((lit(0.6108) * exp((lit(17.27) * tC) / (tC + lit(237.3)))) *
        (h / lit(100.0)))) / (tC + lit(273.16)))

  val queries: Map[String, Q] = Map(
    // E1 — pressure correction with the pressure2-else-pressure1-else-1.0
    // zero-sentinel chain (pipeline/cosmoz_process_levels.py:192-199).
    "e1_pressure_corr" -> Q(
      fn = (s, dir) => {
        val p2 = when(col("event_id") % 3 === 0, lit(0.0)).otherwise(col("value") + lit(1.0))
        val p1 = when(col("event_id") % 5 === 0, lit(0.0)).otherwise(col("value"))
        val beta = lit(0.0074)
        val ref = lit(10.0)
        t(s, dir, "events")
          .select(col("event_id"),
            rd(when(p2 =!= 0.0, exp(beta * (p2 - ref)))
              .when(p1 =!= 0.0, exp(beta * (p1 - ref)))
              .otherwise(lit(1.0)), 6).as("press_corr"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id,
          round(CASE
            WHEN (CASE WHEN event_id % 3 = 0 THEN 0.0 ELSE value + 1.0 END) <> 0.0
              THEN exp(0.0074 * ((CASE WHEN event_id % 3 = 0 THEN 0.0 ELSE value + 1.0 END) - 10.0))
            WHEN (CASE WHEN event_id % 5 = 0 THEN 0.0 ELSE value END) <> 0.0
              THEN exp(0.0074 * ((CASE WHEN event_id % 5 = 0 THEN 0.0 ELSE value END) - 10.0))
            ELSE 1.0 END, 6) AS press_corr
        FROM events
        ORDER BY event_id""")),

    // E2 — water-vapour correction with the external -> SILO-daily -> 1.0
    // fallback chain (pipeline/cosmoz_process_levels.py:221-249).
    "e2_wv_corr" -> Q(
      fn = (s, dir) => {
        val extT = when(col("event_id") % 7 === 0, lit(0.0)).otherwise(col("value"))
        val extH = when(col("event_id") % 11 === 0, lit(0.0)).otherwise(lit(50.0))
        val siloT = when(col("event_id") % 13 === 0, lit(null).cast("double")).otherwise(lit(20.0))
        val siloH = when(col("event_id") % 13 === 0, lit(null).cast("double")).otherwise(lit(60.0))
        val wv = when(extT =!= 0.0 && extH =!= 0.0, wvCorr(extT, extH))
          .when(siloH.isNotNull, wvCorr(coalesce(siloT, lit(0.0)), siloH))
          .otherwise {
            val useH = when(extH === 0.0, siloH).otherwise(extH)
            val useT = when(extT === 0.0, siloT).otherwise(extT)
            when(useH.isNull || useH === 0.0, lit(1.0))
              .otherwise(wvCorr(coalesce(useT, lit(0.0)), useH))
          }
        t(s, dir, "events")
          .select(col("event_id"), rd(wv, 6).as("wv_corr"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT event_id,
            CASE WHEN event_id % 7 = 0 THEN 0.0 ELSE value END AS ext_t,
            CASE WHEN event_id % 11 = 0 THEN 0.0 ELSE 50.0 END AS ext_h,
            CASE WHEN event_id % 13 = 0 THEN NULL ELSE 20.0 END AS silo_t,
            CASE WHEN event_id % 13 = 0 THEN NULL ELSE 60.0 END AS silo_h
          FROM events)
        SELECT event_id,
          round(CASE
            WHEN ext_t <> 0.0 AND ext_h <> 0.0 THEN
              1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * ext_t) / (ext_t + 237.3))) * (ext_h / 100.0))) / (ext_t + 273.16))
            WHEN silo_h IS NOT NULL THEN
              1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * coalesce(silo_t, 0.0)) / (coalesce(silo_t, 0.0) + 237.3))) * (silo_h / 100.0))) / (coalesce(silo_t, 0.0) + 273.16))
            WHEN (CASE WHEN ext_h = 0.0 THEN silo_h ELSE ext_h END) IS NULL
              OR (CASE WHEN ext_h = 0.0 THEN silo_h ELSE ext_h END) = 0.0 THEN 1.0
            ELSE
              1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * coalesce(CASE WHEN ext_t = 0.0 THEN silo_t ELSE ext_t END, 0.0)) / (coalesce(CASE WHEN ext_t = 0.0 THEN silo_t ELSE ext_t END, 0.0) + 237.3))) * ((CASE WHEN ext_h = 0.0 THEN silo_h ELSE ext_h END) / 100.0))) / (coalesce(CASE WHEN ext_t = 0.0 THEN silo_t ELSE ext_t END, 0.0) + 273.16))
            END, 6) AS wv_corr
        FROM base
        ORDER BY event_id""")),

    // E9 + A2 — level1 flag rule over the lagged count
    // (pipeline/cosmoz_process_levels.py:397-402: battery<10 -> 4; count
    // outside [0.8, 1.2] x prev -> 1; else raw flag). First row of each
    // series is skipped, as the reference skips the diff-less first point
    // (:365-369).
    "e9_flag_rule" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("count", floor(col("value") * 10).cast("long"))
          .withColumn("battery", col("value"))
          .withColumn("prev_count", lag(col("count"), 1).over(w))
          .filter(col("prev_count").isNotNull)
          .select(col("event_id"),
            when(col("battery") < 10, lit(4))
              .when(col("count") < lit(0.8) * col("prev_count") ||
                col("count") > lit(1.2) * col("prev_count"), lit(1))
              .otherwise(lit(0)).as("flag"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id,
          CASE WHEN battery < 10 THEN 4
               WHEN cnt < 0.8 * prev_count OR cnt > 1.2 * prev_count THEN 1
               ELSE 0 END AS flag
        FROM (
          SELECT event_id, value AS battery,
                 CAST(floor(value * 10) AS BIGINT) AS cnt,
                 lag(CAST(floor(value * 10) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_count
          FROM events)
        WHERE prev_count IS NOT NULL
        ORDER BY event_id""")),

    // E5-E8 + E10 — soil-moisture conversion, effective depth, rainfall and
    // the level3 flag rule, both default and "sandy" alternate algorithm
    // (pipeline/cosmoz_process_levels.py:96-168).
    "e10_soil_moisture" -> Q(
      fn = (s, dir) => {
        val n0 = lit(100.0)
        val latticeOrg = lit(0.05)
        val bulk = lit(1.4)
        val cc = col("value") * lit(50.0) + lit(20.0)
        val wv = when(col("event_id") % 13 === 0, lit(1.0)).otherwise(lit(1.01))
        val sandy = col("user_id") % 2 === 1
        val cmDefault = (lit(0.0808) / ((cc / n0) - lit(0.372)) - lit(0.115) - latticeOrg) * bulk
        val cmSandy = lit(1216036430.0) * pow(cc, lit(-3.272))
        val cm = when(sandy, cmSandy).otherwise(cmDefault)
        val flag = when(wv === 1.0, lit(5))
          .when(sandy && cc > lit(3.0) * n0, lit(3))
          .when(sandy && cc < lit(0.5) * n0, lit(2))
          .when(!sandy && cc > n0, lit(3))
          .when(!sandy && cc < lit(0.4) * n0, lit(2))
          .otherwise(lit(0))
        t(s, dir, "events")
          .select(col("event_id"), flag.as("flag"),
            rd(cm * lit(100.0), 6).as("soil_moist"),
            rd(lit(5.8) / (latticeOrg * bulk + cm + lit(0.0829)), 6).as("effective_depth"),
            rd(col("value") * lit(0.2), 6).as("rainfall"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT event_id,
            value * 50.0 + 20.0 AS cc,
            CASE WHEN event_id % 13 = 0 THEN 1.0 ELSE 1.01 END AS wv,
            user_id % 2 = 1 AS sandy,
            value
          FROM events),
        calc AS (
          SELECT event_id, cc, wv, sandy, value,
            CASE WHEN sandy THEN 1216036430.0 * pow(cc, -3.272)
                 ELSE (0.0808 / ((cc / 100.0) - 0.372) - 0.115 - 0.05) * 1.4 END AS cm
          FROM base)
        SELECT event_id,
          CASE WHEN wv = 1.0 THEN 5
               WHEN sandy AND cc > 300.0 THEN 3
               WHEN sandy AND cc < 50.0 THEN 2
               WHEN NOT sandy AND cc > 100.0 THEN 3
               WHEN NOT sandy AND cc < 40.0 THEN 2
               ELSE 0 END AS flag,
          round(cm * 100.0, 6) AS soil_moist,
          round(5.8 / (0.05 * 1.4 + cm + 0.0829), 6) AS effective_depth,
          round(value * 0.2, 6) AS rainfall
        FROM calc
        ORDER BY event_id""")),

    // E12 — date/time kit: ISO parse/format, hour/day truncation, epoch
    // (pipeline/utils.py:16-75; hour bounds cosmoz_process_levels.py:203-204).
    "e12_datetime_kit" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            date_trunc("hour", col("ts")).as("hour_ts"),
            to_date(col("ts")).as("day"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso"),
            hour(col("ts")).as("hr"),
            unix_timestamp(col("ts")).as("epoch_s"),
            to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("reparsed"))
          .orderBy(col("event_id")),
      oracle = Some("""
        SELECT event_id,
               date_trunc('hour', ts) AS hour_ts,
               CAST(ts AS DATE) AS day,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso,
               CAST(hour(ts) AS INTEGER) AS hr,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed
        FROM events
        ORDER BY event_id""")),

    // E13 — defensive casts: JSON field extraction with ValueError -> 0.0 +
    // bad flag (pipeline/csv_influx_converter.py:113-117).
    "e13_defensive_cast" -> Q(
      fn = (s, dir) => {
        val kNum = expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)")
        t(s, dir, "events")
          .select(col("event_id"),
            coalesce(kNum, lit(0.0)).as("k_num"),
            when(kNum.isNull, lit(1)).otherwise(lit(0)).as("bad_flag"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id,
               coalesce(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS k_num,
               CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NULL
                    THEN 1 ELSE 0 END AS bad_flag
        FROM events
        ORDER BY event_id""")),

    // S5 — NMDB NEST ASCII parse (nmdb/data_getter.py:77-121): skip to the
    // RCORR_E header (not the DATA TYPE line), skip one separator, then
    // parse `time;value` lines; unparseable value -> 0.0 + bad flag
    // (pipeline/csv_influx_converter.py:113-117). The HTTP fetch is
    // driver-side in the reference too; parsing happens in Spark.
    "s5_nmdb_parse" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val body = Seq(
          "NMDB NEST ASCII interface",
          "# DATA TYPE: RCORR_E corrected for efficiency",
          "  RCORR_E",
          "-----------------------------",
          "2024-01-01 00:00:00;123.456",
          "2024-01-01 01:00:00;124.011",
          "2024-01-01 02:00:00;null",
          "2024-01-01 03:00:00;125.2")
        val marker = body.indexWhere(l => l.contains("RCORR_E") && !l.contains("DATA TYPE"))
        val dataLines = body.drop(marker + 2)
        dataLines.toDF("line")
          .filter(col("line").contains(";"))
          .select(
            to_timestamp(split(col("line"), ";")(0)).as("ts"),
            split(col("line"), ";")(1).as("raw"))
          .select(col("ts"),
            coalesce(expr("try_cast(raw AS DOUBLE)"), lit(0.0)).as("intensity"),
            when(expr("try_cast(raw AS DOUBLE)").isNull, lit(1)).otherwise(lit(0)).as("bad_data_flag"))
          .orderBy(col("ts"))
      },
      oracle = Some("""
        SELECT * FROM (VALUES
          (TIMESTAMP '2024-01-01 00:00:00', CAST(123.456 AS DOUBLE), CAST(0 AS INTEGER)),
          (TIMESTAMP '2024-01-01 01:00:00', CAST(124.011 AS DOUBLE), CAST(0 AS INTEGER)),
          (TIMESTAMP '2024-01-01 02:00:00', CAST(0.0    AS DOUBLE), CAST(1 AS INTEGER)),
          (TIMESTAMP '2024-01-01 03:00:00', CAST(125.2  AS DOUBLE), CAST(0 AS INTEGER))
        ) AS t(ts, intensity, bad_data_flag)
        ORDER BY ts"""))
  )
}
