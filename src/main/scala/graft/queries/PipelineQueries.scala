package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.LevelPipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship end-to-end test: the full raw -> level1 -> level2 ->
  * level3 -> level4 pipeline (every join, window, flag rule and physics
  * expression of the reference) over deterministic synthetic sensor inputs
  * derived from the events table, verified against a single DuckDB oracle
  * that restates the same semantics in ANSI SQL (lag/dedup windows,
  * half-day SILO pick, hour join + ASOF fallbacks, correction chain,
  * soil-moisture conversion, ±3h smoothing).
  *
  * The smoothing averages are computed with per-term rounding + decimal
  * sums so the windowed mean is independent of the engines' frame
  * summation order (Spark rebuilds sliding frames linearly, DuckDB uses
  * segment trees — plain double sums can differ in the last ulp).
  */
object PipelineQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val BaseEpoch = 1704067200L // 2024-01-01 00:00:00 UTC
  private val HMax = 25000L           // intensity grid hours
  private val Days = 1100L            // silo grid days

  /** The station dimension (5 synthetic sites; 1 and 3 run "sandy"). */
  private[graft] def stationsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 5).map { i =>
      LevelPipeline.Station(
        site_no = i,
        beta = 0.0074 + i * 0.0002,
        ref_pressure = 950.0 + i,
        ref_intensity = 120.0,
        elev_scaling = 1.1 + i * 0.01,
        latit_scaling = 0.9 + i * 0.01,
        n0_cal = 120.0 + 5 * i,
        bulk_density = 1.4,
        lattice_water_g_g = 0.03,
        soil_organic_matter_g_g = 0.02,
        alternate_algorithm = if (i % 2 == 1) Some("sandy") else None)
    }.toDF()
  }

  private val stationsSql =
    (0 until 5).map { i =>
      val alt = if (i % 2 == 1) "'sandy'" else "NULL"
      s"(${i}, ${0.0074 + i * 0.0002}, ${950.0 + i}, 120.0, ${1.1 + i * 0.01}, " +
        s"${0.9 + i * 0.01}, ${120.0 + 5 * i}, 1.4, 0.03, 0.02, $alt)"
    }.mkString(",\n          ")

  /** Synthetic raw_values: 5 sites, 30-min cadence, zero-sentinel branches
    * on deterministic event_id residues, plus +10 min clones (every 97th
    * event) that exercise the 29-min dedup.
    */
  private[graft] def rawDf(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), coalesce(col("value"), lit(0.0)).as("v"))
    val base = ev
      .withColumn("site_no", (col("event_id") % 5).cast("int"))
      .withColumn("seq", floor(col("event_id") / 5).cast("long"))
      .withColumn("time", timestamp_seconds(lit(BaseEpoch) + col("seq") * 1800))
      .withColumn("count", (floor(col("v") * 100) % 60 + 50).cast("long"))
      .withColumn("battery", when(col("event_id") % 37 === 0, 5.0).otherwise(12.0))
      .withColumn("pressure1", lit(900.0) + col("v"))
      .withColumn("pressure2",
        when(col("event_id") % 3 === 0, 0.0).otherwise(lit(905.0) + col("v")))
      .withColumn("external_temperature",
        when(col("event_id") % 7 === 0, 0.0).otherwise(lit(15.0) + col("v")))
      .withColumn("external_humidity",
        when(col("event_id") % 11 === 0, 0.0).otherwise(lit(40.0) + col("v")))
      .withColumn("rain", when(col("event_id") % 13 === 0, 5.0).otherwise(0.0))
      .withColumn("internal_temperature", lit(20.0) + col("v"))
      .withColumn("internal_humidity", lit(30.0) + col("v"))
      .withColumn("tube_temperature", lit(21.0) + col("v"))
      .withColumn("tube_humidity", lit(31.0) + col("v"))
      .withColumn("vwc1", col("v"))
      .withColumn("vwc2", col("v") * 2)
      .withColumn("vwc3", col("v") * 3)
      .withColumn("flag", lit(0))
    val clones = base
      .filter(col("event_id") % 97 === 0)
      .withColumn("time",
        timestamp_seconds(lit(BaseEpoch) + col("seq") * 1800 + 600))
    val cols = Seq("site_no", "time", "count", "battery", "pressure1",
      "pressure2", "external_temperature", "external_humidity", "rain",
      "internal_temperature", "internal_humidity", "tube_temperature",
      "tube_humidity", "vwc1", "vwc2", "vwc3", "flag")
    base.select(cols.map(col): _*).unionByName(clones.select(cols.map(col): _*))
  }

  /** Daily SILO climate: one usable row per site-day at 08:00 plus a decoy
    * at 13:00 (must be excluded by the reference's half-day probe window).
    */
  private[graft] def siloDf(s: SparkSession): DataFrame = {
    val days = s.range(Days).select(col("id").as("d"))
    val sites = s.range(5).select(col("id").cast("int").as("site_no"))
    val morning = days.crossJoin(sites).select(
      col("site_no"),
      timestamp_seconds(lit(BaseEpoch) + col("d") * 86400 + 8 * 3600).as("time"),
      (lit(10.0) + col("d") % 20).as("average_temperature"),
      (lit(50.0) + col("d") % 30).as("average_humidity"))
    val decoy = days.crossJoin(sites).select(
      col("site_no"),
      timestamp_seconds(lit(BaseEpoch) + col("d") * 86400 + 13 * 3600).as("time"),
      lit(99.0).as("average_temperature"),
      lit(99.0).as("average_humidity"))
    morning.unionByName(decoy)
  }

  /** Hourly neutron-monitor intensity with every 3rd hour missing (forces
    * the as-of fallback tiers) and every 17th zero (div-zero guard).
    */
  private[graft] def intensityDf(s: SparkSession): DataFrame = {
    val hours = s.range(HMax).select(col("id").as("h"))
      .filter(col("h") % 3 =!= 0)
    val sites = s.range(5).select(col("id").cast("int").as("site_no"))
    hours.crossJoin(sites).select(
      col("site_no"),
      timestamp_seconds(lit(BaseEpoch) + col("h") * 3600).as("time"),
      when(col("h") % 17 === 0, 0.0)
        .otherwise(lit(100.0) + col("h") % 50).as("intensity"))
  }

  /** Shared oracle CTEs: the synthetic raw_values frame (ev/b0/raw). */
  private[graft] val rawCtesSql: String =
    s"""ev AS (
          SELECT event_id, coalesce(value, 0.0) AS v FROM events),
        b0 AS (
          SELECT CAST(event_id % 5 AS INT) AS site_no,
                 CAST(floor(event_id / 5) AS BIGINT) AS seq,
                 event_id, v,
                 CAST(floor(v * 100) AS BIGINT) % 60 + 50 AS count,
                 CASE WHEN event_id % 37 = 0 THEN 5.0 ELSE 12.0 END AS battery,
                 900.0 + v AS pressure1,
                 CASE WHEN event_id % 3 = 0 THEN 0.0 ELSE 905.0 + v END AS pressure2,
                 CASE WHEN event_id % 7 = 0 THEN 0.0 ELSE 15.0 + v END AS external_temperature,
                 CASE WHEN event_id % 11 = 0 THEN 0.0 ELSE 40.0 + v END AS external_humidity,
                 CASE WHEN event_id % 13 = 0 THEN 5.0 ELSE 0.0 END AS rain,
                 20.0 + v AS internal_temperature,
                 30.0 + v AS internal_humidity,
                 21.0 + v AS tube_temperature,
                 31.0 + v AS tube_humidity,
                 v AS vwc1, v * 2 AS vwc2, v * 3 AS vwc3,
                 0 AS flag
          FROM ev),
        raw AS (
          SELECT site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + (seq * 1800) * INTERVAL 1 SECOND AS time,
                 count, battery, pressure1, pressure2, external_temperature,
                 external_humidity, rain, internal_temperature,
                 internal_humidity, tube_temperature, tube_humidity,
                 vwc1, vwc2, vwc3, flag
          FROM b0
          UNION ALL
          SELECT site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + (seq * 1800 + 600) * INTERVAL 1 SECOND AS time,
                 count, battery, pressure1, pressure2, external_temperature,
                 external_humidity, rain, internal_temperature,
                 internal_humidity, tube_temperature, tube_humidity,
                 vwc1, vwc2, vwc3, flag
          FROM b0 WHERE event_id % 97 = 0)"""

  val queries: Map[String, Q] = Map(
    // J7 — the standalone duplicate AUDIT (detect_duplicates.py:62-111):
    // >=5 matching fields among (battery, count, tube_temperature, rain,
    // dynamically-chosen pressure) within the trailing 29 min; emits
    // per-row prior-dup counts. Banded range self-join (bucket + bucket-1
    // probe), so the plan is an equi-join, not a theta explosion.
    "j7_dup_audit" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.nearDupAudit(
          rawDf(s, dir), Seq("site_no"), "time",
          windowSeconds = 29 * 60,
          auditFields = Seq("battery", "count", "tube_temperature", "rain"))
          .orderBy(col("site_no"), col("time")),
      oracle = Some(s"""
        WITH $rawCtesSql,
        audit AS (
          SELECT a.site_no, a.time, count(*) AS n_dups
          FROM raw a JOIN raw b
            ON a.site_no = b.site_no
           AND b.time >= a.time - INTERVAL 1740 SECOND
           AND b.time < a.time
          WHERE (CASE WHEN a.battery = b.battery THEN 1 ELSE 0 END
               + CASE WHEN a.count = b.count THEN 1 ELSE 0 END
               + CASE WHEN a.tube_temperature = b.tube_temperature THEN 1 ELSE 0 END
               + CASE WHEN a.rain = b.rain THEN 1 ELSE 0 END
               + CASE WHEN (CASE WHEN a.pressure2 IS NOT NULL AND a.pressure2 > 10
                                  AND (a.pressure1 IS NULL OR a.pressure1 < 10)
                                 THEN a.pressure2 ELSE a.pressure1 END)
                         = (CASE WHEN a.pressure2 IS NOT NULL AND a.pressure2 > 10
                                  AND (a.pressure1 IS NULL OR a.pressure1 < 10)
                                 THEN b.pressure2 ELSE b.pressure1 END)
                    THEN 1 ELSE 0 END) >= 5
          GROUP BY a.site_no, a.time)
        SELECT site_no, time, n_dups FROM audit
        ORDER BY site_no, time"""),
      bench = true),

    "pl_levels_e2e" -> Q(
      fn = (s, dir) => levelsE2e(s, dir, l1Bucket = None, asofBucket = None),
      oracle = Some(levelsOracleSql),
      bench = true),

    // PL-B — the SAME chain through BOTH measured skew hatches (bucketed
    // level1 lag/dedup + bucketed J4 as-of, 6 h buckets — what
    // processLevels(autoSkew = true) selects at top-key share >= 0.5):
    // identical oracle SQL as pl_levels_e2e, so the two physical chains
    // must hash-match through DuckDB. That is the contract that makes
    // the auto-engaged hatch safe: the skew profile may only ever change
    // the PLAN, never the answer.
    "pl_levels_bucketed" -> Q(
      fn = (s, dir) => levelsE2e(s, dir, l1Bucket = Some(21600L),
        asofBucket = Some(21600L)),
      oracle = Some(levelsOracleSql),
      bench = true),

    // PL-P — the r16 PROFILED decision path under the oracle gate: the
    // hot-key profile is measured once and persisted (SkewOps
    // .hotKeyProfile/writeProfile — the first-run shape), read back to
    // decide the hatches (threshold 0.1 engages BOTH on the 5-site
    // fixture, share ~0.2 — the same hatches pl_levels_bucketed gates),
    // and the chain runs over the OBSERVED raw frame (SkewOps
    // .observeProfile — the free-refresh CollectMetrics node riding the
    // scan). Identical oracle SQL as pl_levels_e2e: the hash match is
    // the proof that neither the profile-driven decision nor the
    // observation node can ever change an answer — only the plan.
    "pl_levels_profiled" -> Q(
      fn = (s, dir) => {
        val profDir = freshTmpDir("plp_") + "/prof"
        val raw = rawDf(s, dir)
        graft.operators.SkewOps.writeProfile(s, profDir,
          graft.operators.SkewOps.hotKeyProfile(raw, Seq("site_no")))
        val prior = graft.operators.SkewOps.readProfile(s, profDir).get
        val (obsRaw, _) = graft.operators.SkewOps.observeProfile(
          raw, Seq("site_no"), Some(prior))
        val b =
          if (graft.operators.SkewOps.engages(prior, 0.1)) Some(21600L)
          else None
        levelsE2e(s, dir, l1Bucket = b, asofBucket = b,
          rawOverride = Some(obsRaw))
      },
      oracle = Some(levelsOracleSql),
      bench = true)
  )

  /** The full raw -> level4 chain as one verifiable frame, the two skew
    * hatches threadable (None/None = the union+window default plan);
    * `rawOverride` lets the profiled entry run the chain over an
    * observation-carrying raw frame.
    */
  private def levelsE2e(
      s: SparkSession,
      dir: String,
      l1Bucket: Option[Long],
      asofBucket: Option[Long],
      rawOverride: Option[DataFrame] = None): DataFrame = {
        val stations = stationsDf(s)
        val l1 = LevelPipeline.level1(rawOverride.getOrElse(rawDf(s, dir)),
          bucketSeconds = l1Bucket)
        val l2 = LevelPipeline.level2(l1, stations, siloDf(s), intensityDf(s),
          bucketedAsofSeconds = asofBucket)
        val l3 = LevelPipeline.level3(l2, stations)
        val valid = l3.filter(col("flag") === 0)
        // the ±3h sums as DECIMAL PREFIX DIFFERENCES (two add-only
        // frames, O(n) — centeredMeanPrefix's construction): decimal
        // addition is exact, so the difference is bit-equal to summing
        // the centered frame directly and the oracle hash is unchanged,
        // while the naive sliding frame's O(n·frame) re-accumulation
        // (the r14 spike's measured bottleneck at dense cadence) is gone
        val r = 3 * 3600 + 1
        val wHi = Window.partitionBy(col("site_no"))
          .orderBy(col("time").cast("long"))
          .rangeBetween(Window.unboundedPreceding, r)
        val wLo = Window.partitionBy(col("site_no"))
          .orderBy(col("time").cast("long"))
          .rangeBetween(Window.unboundedPreceding, -r - 1)
        // inputs at decimal(22,9), sums at (32,9): the subtraction fits
        // precision 33 WITH scale 9 intact — at (38,9) Spark would have
        // to shed scale on the difference and round the 9th digit (the
        // bug the first cut of this rewrite hit)
        val zero = lit(0).cast("decimal(32,9)")
        def pref(c: Column): Column =
          sum(c).over(wHi) - coalesce(sum(c).over(wLo), zero)
        valid
          .withColumn("__sm_sum",
            pref(round(col("soil_moist"), 9).cast("decimal(22,9)")))
          .withColumn("__dp_sum",
            pref(round(col("effective_depth"), 9).cast("decimal(22,9)")))
          .withColumn("__n",
            count(lit(1)).over(wHi) - count(lit(1)).over(wLo))
          .select(col("site_no"), col("time"),
            round(col("soil_moist"), 6).as("soil_moist"),
            round(col("effective_depth"), 6).as("effective_depth"),
            round(col("rainfall"), 6).as("rainfall"),
            round(col("__sm_sum").cast("double") / col("__n"), 6)
              .as("soil_moist_filtered"),
            round(col("__dp_sum").cast("double") / col("__n"), 6)
              .as("depth_filtered"))
          .orderBy(col("site_no"), col("time"))
  }

  /** The single DuckDB restatement both physical chains must hash-match. */
  private lazy val levelsOracleSql: String = s"""
        WITH $rawCtesSql,
        lagged AS (
          SELECT *,
                 lag(count) OVER (PARTITION BY site_no ORDER BY time) AS prev_count,
                 row_number() OVER (PARTITION BY site_no ORDER BY time) AS rn
          FROM raw),
        l1 AS (
          SELECT site_no, time, count, pressure1, pressure2,
                 external_temperature, external_humidity, rain,
                 CASE WHEN battery < 10 THEN 4
                      WHEN count < 0.8 * prev_count OR count > 1.2 * prev_count THEN 1
                      ELSE flag END AS flag
          FROM lagged r
          WHERE rn > 1 AND NOT EXISTS (
            SELECT 1 FROM raw r2
            WHERE r2.site_no = r.site_no
              AND r2.time < r.time
              AND r2.time >= r.time - INTERVAL 1740 SECOND
              AND r2.count = r.count AND r2.battery = r.battery
              AND r2.pressure1 = r.pressure1 AND r2.pressure2 = r.pressure2
              AND r2.external_temperature = r.external_temperature
              AND r2.external_humidity = r.external_humidity
              AND r2.rain = r.rain
              AND r2.internal_temperature = r.internal_temperature
              AND r2.internal_humidity = r.internal_humidity
              AND r2.tube_temperature = r.tube_temperature
              AND r2.tube_humidity = r.tube_humidity
              AND r2.vwc1 = r.vwc1 AND r2.vwc2 = r.vwc2 AND r2.vwc3 = r.vwc3)),
        stations AS (
          SELECT * FROM (VALUES
          $stationsSql)
          s(site_no, beta, ref_pressure, ref_intensity, elev_scaling,
            latit_scaling, n0_cal, bulk_density, lattice_water_g_g,
            soil_organic_matter_g_g, alternate_algorithm)),
        silo AS (
          SELECT CAST(site AS INT) AS site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + (d * 86400 + 8 * 3600) * INTERVAL 1 SECOND AS time,
                 10.0 + d % 20 AS average_temperature,
                 50.0 + d % 30 AS average_humidity
          FROM range(${Days}) t(d), range(5) s2(site)
          UNION ALL
          SELECT CAST(site AS INT),
                 TIMESTAMP '2024-01-01 00:00:00' + (d * 86400 + 13 * 3600) * INTERVAL 1 SECOND,
                 99.0, 99.0
          FROM range(${Days}) t(d), range(5) s2(site)),
        silo_daily AS (
          SELECT site_no, CAST(time AS DATE) AS day,
                 arg_max(average_temperature, time) AS silo_t,
                 arg_max(average_humidity, time) AS silo_h
          FROM silo WHERE CAST(hour(time) AS INT) < 12
          GROUP BY 1, 2),
        intensity AS (
          SELECT CAST(site AS INT) AS site_no,
                 TIMESTAMP '2024-01-01 00:00:00' + (h * 3600) * INTERVAL 1 SECOND AS time,
                 CASE WHEN h % 17 = 0 THEN 0.0 ELSE 100.0 + h % 50 END AS intensity
          FROM range(${HMax}) t(h), range(5) s2(site)
          WHERE h % 3 <> 0),
        int_hourly AS (
          SELECT site_no, date_trunc('hour', time) AS hr,
                 arg_min(intensity, time) AS int_hour
          FROM intensity GROUP BY 1, 2),
        joined AS (
          SELECT l.*, st.beta, st.ref_pressure, st.ref_intensity,
                 st.elev_scaling, st.latit_scaling, st.n0_cal,
                 st.bulk_density, st.lattice_water_g_g,
                 st.soil_organic_matter_g_g, st.alternate_algorithm,
                 sd.silo_t, sd.silo_h, ih.int_hour,
                 ib.intensity AS int_back, fw.intensity AS int_fwd
          FROM l1 l
          JOIN stations st ON l.site_no = st.site_no
          LEFT JOIN silo_daily sd
            ON l.site_no = sd.site_no AND CAST(l.time AS DATE) = sd.day
          LEFT JOIN int_hourly ih
            ON l.site_no = ih.site_no AND date_trunc('hour', l.time) = ih.hr
          ASOF LEFT JOIN intensity ib
            ON l.site_no = ib.site_no AND ib.time <= l.time
          ASOF LEFT JOIN intensity fw
            ON l.site_no = fw.site_no AND fw.time >= l.time),
        l2 AS (
          SELECT site_no, time, flag, count, rain,
                 n0_cal, bulk_density, lattice_water_g_g,
                 soil_organic_matter_g_g, alternate_algorithm,
                 CASE WHEN p_use IS NOT NULL THEN exp(beta * (p_use - ref_pressure)) ELSE 1.0 END AS press_corr,
                 wv_corr,
                 CASE WHEN i_use = 0.0 THEN 1.0 ELSE i_use / ref_intensity END AS intensity_corr,
                 (count
                  * wv_corr
                  * (CASE WHEN p_use IS NOT NULL THEN exp(beta * (p_use - ref_pressure)) ELSE 1.0 END)
                  / (CASE WHEN i_use = 0.0 THEN 1.0 ELSE i_use / ref_intensity END))
                 / (latit_scaling / elev_scaling) AS corr_count
          FROM (
            SELECT *,
                   CASE WHEN pressure2 <> 0.0 THEN pressure2
                        WHEN pressure1 <> 0.0 THEN pressure1 END AS p_use,
                   coalesce(int_hour, int_back, int_fwd, 0.0) AS i_use,
                   CASE
                     WHEN external_temperature <> 0.0 AND external_humidity <> 0.0 THEN
                       1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * external_temperature) / (external_temperature + 237.3))) * (external_humidity / 100.0))) / (external_temperature + 273.16))
                     WHEN silo_h IS NOT NULL THEN
                       1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * coalesce(silo_t, 0.0)) / (coalesce(silo_t, 0.0) + 237.3))) * (silo_h / 100.0))) / (coalesce(silo_t, 0.0) + 273.16))
                     WHEN (CASE WHEN external_humidity = 0.0 THEN silo_h ELSE external_humidity END) IS NULL
                       OR (CASE WHEN external_humidity = 0.0 THEN silo_h ELSE external_humidity END) = 0.0 THEN 1.0
                     ELSE
                       1.0 + 0.0054 * ((2165.0 * ((0.6108 * exp((17.27 * coalesce(CASE WHEN external_temperature = 0.0 THEN silo_t ELSE external_temperature END, 0.0)) / (coalesce(CASE WHEN external_temperature = 0.0 THEN silo_t ELSE external_temperature END, 0.0) + 237.3))) * ((CASE WHEN external_humidity = 0.0 THEN silo_h ELSE external_humidity END) / 100.0))) / (coalesce(CASE WHEN external_temperature = 0.0 THEN silo_t ELSE external_temperature END, 0.0) + 273.16))
                   END AS wv_corr
            FROM joined)),
        l3 AS (
          SELECT site_no, time,
                 CASE WHEN wv_corr = 1.0 THEN 5
                      WHEN sandy AND corr_count > 3.0 * n0_cal THEN 3
                      WHEN sandy AND corr_count < 0.5 * n0_cal THEN 2
                      WHEN NOT sandy AND corr_count > n0_cal THEN 3
                      WHEN NOT sandy AND corr_count < 0.4 * n0_cal THEN 2
                      ELSE flag END AS flag,
                 cm * 100.0 AS soil_moist,
                 5.8 / ((lattice_water_g_g + soil_organic_matter_g_g) * bulk_density + cm + 0.0829) AS effective_depth,
                 CAST(rain AS DOUBLE) * 0.2 AS rainfall
          FROM (
            SELECT *,
                   coalesce(alternate_algorithm, '') = 'sandy' AS sandy,
                   CASE WHEN coalesce(alternate_algorithm, '') = 'sandy'
                        THEN 1216036430.0 * pow(corr_count, -3.272)
                        ELSE (0.0808 / ((corr_count / n0_cal) - 0.372) - 0.115
                              - (lattice_water_g_g + soil_organic_matter_g_g)) * bulk_density
                   END AS cm
            FROM l2)),
        valid AS (SELECT * FROM l3 WHERE flag = 0),
        smoothed AS (
          SELECT site_no, time, soil_moist, effective_depth, rainfall,
                 sum(CAST(round(soil_moist, 9) AS DECIMAL(38,9))) OVER w AS sm_sum,
                 sum(CAST(round(effective_depth, 9) AS DECIMAL(38,9))) OVER w AS dp_sum,
                 count(*) OVER w AS n
          FROM valid
          WINDOW w AS (PARTITION BY site_no
                       ORDER BY CAST(floor(epoch(time)) AS BIGINT)
                       RANGE BETWEEN 10801 PRECEDING AND 10801 FOLLOWING))
        SELECT site_no, time,
               round(soil_moist, 6) AS soil_moist,
               round(effective_depth, 6) AS effective_depth,
               round(rainfall, 6) AS rainfall,
               round(CAST(sm_sum AS DOUBLE) / n, 6) AS soil_moist_filtered,
               round(CAST(dp_sum AS DOUBLE) / n, 6) AS depth_filtered
        FROM smoothed
        ORDER BY site_no, time"""
}
