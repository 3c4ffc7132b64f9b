package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.{AsofStrategies, SkewOps, TimeSeriesOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins and windowed aggregates — SURVEY.md §2.3 (J2-J4, J6),
  * §2.4 (A1-A4), §2.1 (S13) on the events/orders tables. These are the
  * operators the reference implements as per-row correlated InfluxQL
  * lookups; here each is one shuffle + one per-partition sort.
  */
object TemporalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, Q] = Map(
    // S13 — imei->site as-of pick (nmdb/mongo_db.py:20-56: among candidates,
    // take the one with latest installation_date <= sent date):
    // row_number over desc order, keep rank 1.
    "s13_asof_pick" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .filter(col("o_orderdate") <= lit("1997-06-30 00:00:00").cast("timestamp"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .orderBy(col("o_custkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
          WHERE o_orderdate <= TIMESTAMP '1997-06-30 00:00:00')
        WHERE rn = 1
        ORDER BY o_custkey""")),

    // J2 — day-equality join (pipeline/level1->level2.sql:105-106:
    // CONVERT(date, l.Timestamp) = CONVERT(date, s.Date2)): events joined to
    // a per-day rollup on the date key.
    "j2_day_join" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val daily = ev
          .groupBy(to_date(col("ts")).as("day"))
          .agg(rd(sum(dec2(col("value"))), 2).as("day_total"),
            count(lit(1)).as("day_n"))
        ev.filter(col("event_type") === "purchase")
          .withColumn("day", to_date(col("ts")))
          .join(daily, "day")
          .select(col("event_id"), col("day"), col("value"),
            col("day_total"), col("day_n"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day,
                 round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS day_total,
                 count(*) AS day_n
          FROM events GROUP BY 1)
        SELECT e.event_id, CAST(e.ts AS DATE) AS day, e.value, d.day_total, d.day_n
        FROM events e JOIN daily d ON CAST(e.ts AS DATE) = d.day
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // J3 + A3 — hour-equality left join with a last-per-group selector
    // (pipeline/level1->level2.sql:113-114 hour match;
    // pipeline/cosmoz_process_levels.py:209 LAST(*) selector).
    "j3_hour_join" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val hourly = ev.filter(col("event_type") === "error")
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          .agg(max_by(col("value"), col("ts")).as("last_err"))
        ev.filter(col("event_type") === "purchase")
          .withColumn("hr", date_trunc("hour", col("ts")))
          .join(hourly, Seq("hr"), "left")
          .select(col("event_id"), col("hr"),
            coalesce(col("last_err"), lit(-1.0)).as("intensity"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT date_trunc('hour', ts) AS hr, arg_max(value, ts) AS last_err
          FROM events WHERE event_type = 'error' GROUP BY 1)
        SELECT e.event_id, date_trunc('hour', e.ts) AS hr,
               coalesce(h.last_err, -1.0) AS intensity
        FROM events e LEFT JOIN h ON date_trunc('hour', e.ts) = h.hr
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // J4 — as-of lookup with backward-then-forward fallback
    // (pipeline/cosmoz_process_levels.py:259-285): for each click, the last
    // purchase value at or before it, else the first after, else -1.
    "j4_asof_lookup" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        TimeSeriesOps
          .asOfLookup(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("value"))
          .select(col("event_id"), col("user_id"),
            coalesce(col("value_asof"), lit(-1.0)).as("asof_value"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT a.event_id, a.user_id,
               coalesce(
                 (SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                    AND b.ts <= a.ts
                  ORDER BY b.ts DESC LIMIT 1),
                 (SELECT c.value FROM events c
                  WHERE c.user_id = a.user_id AND c.event_type = 'purchase'
                    AND c.ts >= a.ts
                  ORDER BY c.ts ASC LIMIT 1),
                 -1.0) AS asof_value
        FROM events a
        WHERE a.event_type = 'click'
        ORDER BY a.event_id""")),

    // J4b — the emulate_old_version quirk on the backward tier
    // (pipeline/cosmoz_process_levels.py:262-264: `FIRST(intensity) WHERE
    // time <= t` — the OLDEST row at/before t, not the latest; forward
    // fallback unchanged). Previously spec-only; the quirk is plain SQL.
    "j8_asof_old_emulation" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        TimeSeriesOps
          .asOfLookup(clicks, purchases, Seq("user_id"), "ts", "ts",
            Seq("value"), backwardPickFirst = true)
          .select(col("event_id"), col("user_id"),
            coalesce(col("value_asof"), lit(-1.0)).as("asof_value"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT a.event_id, a.user_id,
               coalesce(
                 (SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                    AND b.ts <= a.ts
                  ORDER BY b.ts ASC LIMIT 1),
                 (SELECT c.value FROM events c
                  WHERE c.user_id = a.user_id AND c.event_type = 'purchase'
                    AND c.ts >= a.ts
                  ORDER BY c.ts ASC LIMIT 1),
                 -1.0) AS asof_value
        FROM events a
        WHERE a.event_type = 'click'
        ORDER BY a.event_id""")),

    // J11 — the bucketed as-of ESCAPE HATCH, oracle-gated: j4's exact
    // semantics through AsofStrategies.asOfLookupBucketed (6 h buckets),
    // the skew-robust alternative whose parallelism is rows/bucket
    // instead of rows/series (SCALE.md §9 measured it 3× faster than the
    // union+window default when one series carries 50% of rows, ~2×
    // slower otherwise — hence hatch, not default). Same oracle SQL as
    // j4: the two physical strategies must hash-match through DuckDB,
    // which is the contract that makes per-workload switching safe.
    "j11_bucketed_asof" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        AsofStrategies
          .asOfLookupBucketed(clicks, purchases, Seq("user_id"), "ts",
            "ts", Seq("value"), bucketSeconds = 21600L)
          .select(col("event_id"), col("user_id"),
            coalesce(col("value_asof"), lit(-1.0)).as("asof_value"))
          .orderBy(col("event_id"))
      },
      bench = true,
      oracle = Some("""
        SELECT a.event_id, a.user_id,
               coalesce(
                 (SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                    AND b.ts <= a.ts
                  ORDER BY b.ts DESC LIMIT 1),
                 (SELECT c.value FROM events c
                  WHERE c.user_id = a.user_id AND c.event_type = 'purchase'
                    AND c.ts >= a.ts
                  ORDER BY c.ts ASC LIMIT 1),
                 -1.0) AS asof_value
        FROM events a
        WHERE a.event_type = 'click'
        ORDER BY a.event_id""")),

    // J13 — temporal anti-join: clicks with NO purchase by the same
    // user within the following hour — the "did not convert" cohort,
    // the NOT-EXISTS-with-range shape every funnel-debugging session
    // needs. Decorrelates to ONE left_anti join with an equi user key
    // plus range predicates — the user-key shuffle does the work, the
    // range condition only filters within matched keys (never a
    // cartesian pairing).
    "j13_temporal_antijoin" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pts"))
        clicks.join(purch,
          col("user_id") === col("pu") &&
            col("pts") >= col("ts") &&
            col("pts") <= col("ts") + expr("INTERVAL 1 HOUR"),
          "left_anti")
          .orderBy(col("event_id"))
      },
      bench = true,
      oracle = Some("""
        SELECT a.event_id, a.user_id, a.ts
        FROM events a
        WHERE a.event_type = 'click' AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
            AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
        ORDER BY a.event_id""")),

    // J14 — bounded-staleness as-of: the backward tier only, with a
    // 2-hour freshness guard — the sensor-fusion rule that a reading
    // older than the tolerance is WORSE than no reading (j4 would
    // happily join a week-old purchase). The match timestamp rides
    // along as a second value column and one post-filter applies the
    // bound; nearest-preceding-then-bound equals bounded-window pick
    // exactly, so no second window is needed.
    "j14_asof_staleness" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
          .withColumn("rts", col("ts"))
        TimeSeriesOps
          .asOfLookup(clicks, purch, Seq("user_id"), "ts", "ts",
            Seq("value", "rts"), forward = false)
          .select(col("event_id"), col("user_id"),
            coalesce(
              when(unix_micros(col("ts")) - unix_micros(col("rts_asof"))
                <= lit(7200L * 1000000L), col("value_asof")),
              lit(-1.0)).as("asof_value"))
          .orderBy(col("event_id"))
      },
      bench = true,
      oracle = Some("""
        SELECT a.event_id, a.user_id,
               coalesce(
                 (SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id
                    AND b.event_type = 'purchase'
                    AND b.ts <= a.ts
                    AND b.ts >= a.ts - INTERVAL 2 HOUR
                  ORDER BY b.ts DESC LIMIT 1),
                 -1.0) AS asof_value
        FROM events a
        WHERE a.event_type = 'click'
        ORDER BY a.event_id""")),

    // J6 — 29-minute near-duplicate suppression
    // (pipeline/cosmoz_process_levels.py:375-390, is_duplicate :316-337):
    // drop a row if an equal row exists in the preceding 29 minutes of the
    // same series. Window + exists, not a self-join.
    "j6_dedup_within" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps
          .dedupWithin(t(s, dir, "events"), Seq("user_id"), "ts",
            windowSeconds = 29 * 60, cmpCols = Seq("event_type"))
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
          .orderBy(col("event_id")),
      oracle = Some("""
        SELECT event_id, user_id, event_type, ts FROM events a
        WHERE NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id
            AND b.event_type = a.event_type
            AND b.ts < a.ts
            AND b.ts >= a.ts - INTERVAL 1740 SECOND)
        ORDER BY event_id"""),
      bench = true),

    // J6-B — the 29-min dedup through BUCKET-AND-CARRY (TimeSeriesOps
    // .dedupWithinBucketed, 6 h buckets >= the 29-min window, so a row's
    // latest strictly-earlier equal row is in its own bucket or exactly
    // one back — ONE carried max-timestamp per (group, bucket) replaces
    // the serialized whole-series sort when one series floods identical
    // tuples). Same oracle SQL as j6_dedup_within: the two physical
    // dedups must hash-match through DuckDB.
    "j6b_dedup_bucketed" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps
          .dedupWithinBucketed(t(s, dir, "events"), Seq("user_id"), "ts",
            windowSeconds = 29 * 60, cmpCols = Seq("event_type"),
            bucketSeconds = 21600L)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
          .orderBy(col("event_id")),
      oracle = Some("""
        SELECT event_id, user_id, event_type, ts FROM events a
        WHERE NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id
            AND b.event_type = a.event_type
            AND b.ts < a.ts
            AND b.ts >= a.ts - INTERVAL 1740 SECOND)
        ORDER BY event_id"""),
      bench = true),

    // A1 — centered +/-3h(+1s) moving aggregate (the level4 filter,
    // pipeline/cosmoz_process_levels.py:62-77). Range frame on epoch
    // seconds; exact decimal sum + count, avg derived deterministically.
    "a1_moving_avg" -> Q(
      fn = (s, dir) => {
        // decimal prefix differences instead of the centered frame:
        // same values bit-for-bit (decimal addition is exact), O(n)
        // instead of SlidingWindowFunctionFrame's O(n·frame)
        // re-accumulation — centeredMeanPrefix's construction, applied
        // where the oracle already sums decimals
        val r = 3 * 3600 + 1
        val wHi = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").cast("long"))
          .rangeBetween(Window.unboundedPreceding, r)
        val wLo = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").cast("long"))
          .rangeBetween(Window.unboundedPreceding, -r - 1)
        t(s, dir, "events")
          .filter(col("event_type") === "view")
          .withColumn("mv_sum_d",
            sum(dec2(col("value"))).over(wHi) -
              coalesce(sum(dec2(col("value"))).over(wLo),
                lit(0).cast("decimal(18,2)")))
          .withColumn("mv_n",
            count(lit(1)).over(wHi) - count(lit(1)).over(wLo))
          .select(col("event_id"), col("user_id"),
            rd(col("mv_sum_d"), 2).as("mv_sum"), col("mv_n"),
            rd(col("mv_sum_d").cast("double") / col("mv_n"), 6).as("mv_avg"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id, user_id,
               round(CAST(mv_sum_d AS DOUBLE), 2) AS mv_sum, mv_n,
               round(CAST(mv_sum_d AS DOUBLE) / mv_n, 6) AS mv_avg
        FROM (
          SELECT event_id, user_id,
                 sum(CAST(value AS DECIMAL(18,2))) OVER w AS mv_sum_d,
                 count(*) OVER w AS mv_n
          FROM events WHERE event_type = 'view'
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                       RANGE BETWEEN 10801 PRECEDING AND 10801 FOLLOWING))
        ORDER BY event_id"""),
      bench = true),

    // A2 — per-series lag / DIFFERENCE (pipeline/cosmoz_process_levels.py:
    // 357-361; TSQL LAG raw->level1.sql:91-92).
    "a2_lag_diff" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps
          .withLag(t(s, dir, "events"), Seq("user_id"), "ts",
            Seq("value"), tieBreak = Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("value"),
            col("value_prev"),
            (col("value") - col("value_prev")).as("diff"))
          .orderBy(col("event_id")),
      oracle = Some("""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS value_prev,
               value - lag(value) OVER w AS diff
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""")),

    // A2-B — the lag through BUCKET-AND-CARRY (TimeSeriesOps
    // .withLagBucketed, 6 h buckets): withLag's exact semantics with the
    // hot-series serialization broken up — rows shuffle on (series,
    // bucket) and the first row of each bucket takes ONE carried value
    // from the previous non-empty bucket (the j11 grid trick applied to
    // level1's measured 40-of-71.5 s residual, SCALE.md §10 finding 2).
    // Same oracle SQL as a2_lag_diff: both physical forms must
    // hash-match through DuckDB, which is what makes the auto-engaged
    // skew hatch safe.
    "a2b_lag_bucketed" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps
          .withLagBucketed(t(s, dir, "events"), Seq("user_id"), "ts",
            Seq("value"), bucketSeconds = 21600L, tieBreak = Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("value"),
            col("value_prev"),
            (col("value") - col("value_prev")).as("diff"))
          .orderBy(col("event_id")),
      bench = true,
      oracle = Some("""
        SELECT event_id, user_id, value,
               lag(value) OVER w AS value_prev,
               value - lag(value) OVER w AS diff
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""")),

    // A3 — last-per-group selector (SELECT LAST(*) ... GROUP BY day;
    // pipeline/cosmoz_process_levels.py:209): max_by / arg_max.
    "a3_last_per_group" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max_by(col("value"), col("ts")).as("last_value"),
            max(col("ts")).as("last_ts"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id"), col("day")),
      oracle = Some("""
        SELECT user_id, CAST(ts AS DATE) AS day,
               arg_max(value, ts) AS last_value,
               max(ts) AS last_ts, count(*) AS n
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
        ORDER BY user_id, day""")),

    // A6 — regular-grid resample + forward fill: the set-based form of
    // InfluxQL GROUP BY time(1d) fill(previous). Daily buckets per user,
    // gaps materialized from each user's own span, last value carried.
    "a6_resample_ffill" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.resample(
          t(s, dir, "events"), "user_id", "ts", "value",
          intervalSeconds = 86400L)
          .orderBy(col("user_id"), col("bucket_start")),
      oracle = Some("""
        WITH a AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS b,
                 count(*) AS n_events,
                 round(CAST(sum(CAST(round(value, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) / count(*), 6) AS avg_v
          FROM events GROUP BY 1, 2),
        s AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM a GROUP BY 1),
        g AS (SELECT user_id, unnest(generate_series(lo, hi)) AS b FROM s),
        j AS (
          SELECT g.user_id, g.b, a.n_events, a.avg_v
          FROM g LEFT JOIN a ON a.user_id = g.user_id AND a.b = g.b)
        SELECT user_id, b * 86400 AS bucket_start,
               coalesce(n_events, 0) AS n_events, avg_v,
               last_value(avg_v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
               avg_v IS NULL AS is_gap
        FROM j
        ORDER BY user_id, bucket_start""")),

    // A45 — resample with LINEAR interpolation (a6's fill(linear)
    // sibling, InfluxQL's third fill mode): 6-hour buckets per user
    // (~10k gap rows at sf0.01 — the interpolation path carries real
    // weight), each gap filled between the nearest non-empty buckets.
    // The lerp itself is EXACT integer arithmetic with explicit
    // half-up — (2·(pv6·(nb−b) + nv6·(b−pb)) + den) div (2·den) over
    // ×10⁶-scaled neighbors — because the float form lands exactly on
    // 6-dp rounding midpoints where the engines' round() disagree
    // (see resampleInterp's scaladoc). The oracle restates the
    // carriers as IGNORE NULLS last/first windows and the identical
    // integer construction.
    "a45_resample_interp" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.resampleInterp(
          t(s, dir, "events"), "user_id", "ts", "value",
          intervalSeconds = 21600L)
          .orderBy(col("user_id"), col("bucket_start")),
      bench = true,
      oracle = Some("""
        WITH a AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS b,
                 count(*) AS n_events,
                 round(CAST(sum(CAST(round(value, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) / count(*), 6) AS avg_v
          FROM events GROUP BY 1, 2),
        s AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM a GROUP BY 1),
        g AS (SELECT user_id, unnest(generate_series(lo, hi)) AS b FROM s),
        j AS (
          SELECT g.user_id, g.b, a.n_events, a.avg_v
          FROM g LEFT JOIN a ON a.user_id = g.user_id AND a.b = g.b),
        c AS (
          SELECT user_id, b, n_events, avg_v,
                 last_value(CASE WHEN avg_v IS NOT NULL THEN b END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pb,
                 last_value(avg_v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS pv,
                 first_value(CASE WHEN avg_v IS NOT NULL THEN b END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nb,
                 first_value(avg_v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY b
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nv
          FROM j),
        d AS (
          SELECT user_id, b, n_events, avg_v, pb, nb,
                 CAST(CAST(pv AS DECIMAL(24,6)) * 1000000 AS BIGINT)
                   AS pv6,
                 CAST(CAST(nv AS DECIMAL(24,6)) * 1000000 AS BIGINT)
                   AS nv6
          FROM c)
        SELECT user_id, b * 21600 AS bucket_start,
               coalesce(n_events, 0) AS n_events, avg_v,
               CASE WHEN avg_v IS NOT NULL THEN avg_v
                    ELSE CAST(((pv6 * (nb - b) + nv6 * (b - pb)) * 2
                           + (nb - pb)) // ((nb - pb) * 2) AS DOUBLE)
                         / 1000000
               END AS v_interp,
               avg_v IS NULL AS is_gap
        FROM d
        ORDER BY user_id, bucket_start""")),

    // A46 — per-key OLS trend (slope/day, intercept at the origin, r²)
    // of value over time: the regression twin of e11's drift check and
    // the per-source drift statistic a fleet monitor fits. x = whole
    // seconds since 2024-01-01 (integer), y = value×100 half-up to an
    // integer, so all five moment sums fold EXACTLY (decimal on the
    // Spark side, HUGEINT in DuckDB), the closed-form numerators and
    // denominators — including the ×86400 day factor and the y-scale —
    // assemble in exact integer arithmetic, and each output is one
    // double division (r² multiplies/divides the same exact operands
    // in IEEE double, identical cross-engine). One partial-aggregable
    // exchange on event_type.
    "a46_ols_trend" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.olsTrend(
          t(s, dir, "events"), Seq("event_type"), "ts", "value"),
      bench = true,
      oracle = Some("""
        WITH b AS (
          SELECT event_type,
                 (epoch_us(ts) -
                  epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 1000000
                   AS x,
                 CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS y
          FROM events),
        g AS (
          SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
          FROM b GROUP BY 1),
        d AS (
          SELECT event_type, n,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS den,
                 n * syy - sy * sy AS den2,
                 sy * sxx - sx * sxy AS inum
          FROM g)
        SELECT event_type, n,
               CASE WHEN den > 0 THEN
                 round(CAST(num * 86400 AS DOUBLE) /
                       CAST(den * 100 AS DOUBLE), 9) END AS slope_per_day,
               CASE WHEN den > 0 THEN
                 round(CAST(inum AS DOUBLE) /
                       CAST(den * 100 AS DOUBLE), 6) END AS intercept,
               CASE WHEN den > 0 AND den2 > 0 THEN
                 round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
                       (CAST(den AS DOUBLE) * CAST(den2 AS DOUBLE)), 9)
               END AS r2
        FROM d
        ORDER BY event_type""")),

    // A47 — OLS as a MERGEABLE summary: the corpus is split at a time
    // midpoint, each half summarized independently (the five moment
    // sums + n — all exact integer/decimal sums), the summaries merged
    // by plain addition, and the trend estimated from the merged
    // state. The oracle is a46's one-shot SQL VERBATIM — the row
    // hash-matching it IS the associativity proof (per-day/partition/
    // stream-batch regression state folds without re-reading history,
    // the additive-sketch property KMV/CMS/Bloom/MG already have).
    "a47_ols_merge" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val mid = lit("2024-02-01 00:00:00").cast("timestamp")
        val half = (pred: org.apache.spark.sql.Column) =>
          graft.operators.TimeSeriesOps.olsSummarize(
            ev.filter(pred), Seq("event_type"), "ts", "value")
        graft.operators.TimeSeriesOps.olsEstimate(
          graft.operators.TimeSeriesOps.olsMerge(
            half(col("ts") < mid).unionByName(half(col("ts") >= mid)),
            Seq("event_type")),
          Seq("event_type"))
      },
      bench = true,
      oracle = Some("""
        WITH b AS (
          SELECT event_type,
                 (epoch_us(ts) -
                  epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 1000000
                   AS x,
                 CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT) AS y
          FROM events),
        g AS (
          SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
          FROM b GROUP BY 1),
        d AS (
          SELECT event_type, n,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS den,
                 n * syy - sy * sy AS den2,
                 sy * sxx - sx * sxy AS inum
          FROM g)
        SELECT event_type, n,
               CASE WHEN den > 0 THEN
                 round(CAST(num * 86400 AS DOUBLE) /
                       CAST(den * 100 AS DOUBLE), 9) END AS slope_per_day,
               CASE WHEN den > 0 THEN
                 round(CAST(inum AS DOUBLE) /
                       CAST(den * 100 AS DOUBLE), 6) END AS intercept,
               CASE WHEN den > 0 AND den2 > 0 THEN
                 round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
                       (CAST(den AS DOUBLE) * CAST(den2 AS DOUBLE)), 9)
               END AS r2
        FROM d
        ORDER BY event_type""")),

    // J10 — point-in-interval RANGE join (no equi key): which events
    // fall inside each event-type's opening 2-day window. Spark's naive
    // plan for a pure inequality join is a nested loop over the full
    // product; pointInInterval buckets time (1-day buckets ~ the 2-day
    // interval length) and runs an equi join on the bucket with the
    // exact [start, end) predicate as a post-filter — the shuffle
    // carries points + ~2 rows per interval instead of points x
    // intervals pairs. The oracle states the same join as a plain
    // inequality join, which DuckDB executes directly.
    "j10_range_join" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val iv = ev.groupBy(col("event_type").as("itype"))
          .agg(min(col("ts")).as("iv_start"))
          .withColumn("iv_end",
            col("iv_start") + expr("INTERVAL 2 DAYS"))
        graft.operators.TimeSeriesOps.pointInInterval(
          ev, "ts", iv, "iv_start", "iv_end", bucketSeconds = 86400L)
          .groupBy(col("itype"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("itype"))
      },
      oracle = Some("""
        WITH iv AS (
          SELECT event_type AS itype, min(ts) AS s,
                 min(ts) + INTERVAL 2 DAY AS e
          FROM events GROUP BY 1)
        SELECT iv.itype, count(*) AS n,
               count(DISTINCT ev.user_id) AS n_users
        FROM events ev, iv
        WHERE ev.ts >= iv.s AND ev.ts < iv.e
        GROUP BY iv.itype
        ORDER BY iv.itype""")),

    // J12 — interval OVERLAP join (two-sided j10): each user's FIRST-DAY
    // activity span vs per-type 12-hour launch windows — which users
    // were active while each event type was live. Both interval
    // families are BOUNDED (1 day / 12 h), so the bucket explode factor
    // is a constant (≤5 / ≤3 at 6 h buckets) at ANY scale factor — an
    // unbounded min..max span would explode with the corpus's time
    // coverage, defeating the operator's cost model. Each pair matches
    // in exactly one canonical bucket; both engines evaluate the same
    // closed-interval predicate.
    "j12_interval_overlap" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val userSpans = ev.groupBy(col("user_id"))
          .agg(min(col("ts")).as("u_start"))
          .withColumn("u_end", col("u_start") + expr("INTERVAL 1 DAY"))
        val typeSpans = ev.groupBy(col("event_type"))
          .agg(min(col("ts")).as("t_start"))
          .withColumn("t_end", col("t_start") + expr("INTERVAL 12 HOURS"))
        TimeSeriesOps.intervalOverlapJoin(
          userSpans, "u_start", "u_end",
          typeSpans, "t_start", "t_end", bucketSeconds = 21600L)
          .select(col("user_id"), col("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id, min(ts) AS us,
                 min(ts) + INTERVAL 1 DAY AS ue
          FROM events GROUP BY user_id),
        t AS (
          SELECT event_type, min(ts) AS ts0,
                 min(ts) + INTERVAL 12 HOUR AS te
          FROM events GROUP BY event_type)
        SELECT t.event_type, count(*) AS n_users
        FROM u, t
        WHERE u.us <= t.te AND t.ts0 <= u.ue
        GROUP BY t.event_type
        ORDER BY t.event_type""")),

    // A7 — gap-based sessionization (30-min web-analytics rule): one
    // shuffle on user_id; boundary lag, the running session counter, and
    // the per-session rollup all ride the same sorted pass (the groupBy
    // keys prefix the window partitioning). The oracle restates the
    // boundary/running-sum construction over epoch MICROseconds (full
    // timestamp precision, mirroring the operator) — session ids are
    // order-deterministic (ts, event_id ties), so start/end/counts
    // hash-match exactly.
    "a7_sessionize" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.sessionize(
          t(s, dir, "events"), Seq("user_id"), "ts",
          gapSeconds = 1800L, tieBreak = Seq("event_id"))
          .orderBy(col("user_id"), col("session_no")),
      oracle = Some("""
        WITH b AS (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) AS e,
                 lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS pe
          FROM events),
        s AS (
          SELECT user_id, ts,
                 sum(CASE WHEN pe IS NULL OR e - pe > 1800000000
                     THEN 1 ELSE 0 END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sn
          FROM b)
        SELECT user_id, CAST(sn AS BIGINT) AS session_no,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM s
        GROUP BY user_id, sn
        ORDER BY user_id, session_no""")),

    // A9 — per-group EXACT quantiles: median and p90 per event type.
    // Spark's percentile() and DuckDB's quantile_cont() both implement
    // the standard linear-interpolation definition, so the values match
    // to the 6-dp round. (approx_percentile is the 100 TB path when
    // exactness can yield — different engines' sketches don't hash-
    // match, which is exactly why the EXACT form is the oracle row.)
    "a9_group_quantiles" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(rd(expr("percentile(value, 0.5)"), 6).as("median_v"),
            rd(expr("percentile(value, 0.9)"), 6).as("p90_v"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS median_v,
               round(quantile_cont(value, 0.9), 6) AS p90_v,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // A10 — pivot (long -> wide report shape): daily counts per event
    // type as columns. The value list is EXPLICIT — with it the output
    // schema is static and Spark skips the extra distinct-scan job that
    // an implicit pivot needs to discover the columns (on 100 TB that
    // discovery pass costs as much as the pivot). The oracle is the
    // standard conditional-aggregation rewrite, which is also exactly
    // how Spark executes pivot under the hood.
    "a10_pivot" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("day")),
      oracle = Some("""
        SELECT CAST(ts AS DATE) AS day,
               count(*) FILTER (WHERE event_type = 'click') AS click,
               count(*) FILTER (WHERE event_type = 'error') AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS signup,
               count(*) FILTER (WHERE event_type = 'view') AS view
        FROM events
        GROUP BY 1
        ORDER BY day""")),

    // A36 — unpivot/melt, a10's inverse and the reshape family's other
    // half: four wide measure columns become (measure, val) long rows
    // through ONE Expand pass — no shuffle, no join, 4 output rows per
    // input row materialized map-side (PlanSpec pins the Expand + zero
    // exchanges). Values are raw stored doubles, no arithmetic needed.
    "a36_unpivot" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "measure", "val")
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("measure")),
      bench = true,
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               'l_quantity' AS measure, l_quantity AS val
        FROM lineitem WHERE l_orderkey <= 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey <= 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey <= 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber, measure""")),

    // A11 — analytic rank kit: rank / dense_rank / percent_rank /
    // cume_dist / ntile(4) per user over value. All five are
    // tie-deterministic under the (value, event_id) ordering (the
    // tie-break matters only to ntile's row placement — the rank
    // functions are tie-stable by definition), so both engines emit
    // identical rows. One window, one shuffle, evaluated in a single
    // sorted pass.
    "a11_rank_kit" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").asc, col("event_id").asc)
        t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            rd(percent_rank().over(w), 6).as("prnk"),
            rd(cume_dist().over(w), 6).as("cdist"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        SELECT event_id, user_id, value,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               round(percent_rank() OVER w, 6) AS prnk,
               round(cume_dist() OVER w, 6) AS cdist,
               CAST(ntile(4) OVER w AS INT) AS quartile
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        ORDER BY event_id""")),

    // A4 — top-1 by time per series (nmdb/influx_db.py:175,219:
    // ORDER BY time DESC/ASC LIMIT 1).
    "a4_top1_by_time" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("first_ts"),
            max(col("ts")).as("last_ts"),
            max_by(col("event_id"), col("ts")).as("last_event_id"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id")),
      oracle = Some("""
        SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
               arg_max(event_id, ts) AS last_event_id, count(*) AS n
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // A12 — greedy-earliest funnel (view → click → purchase): step 1 is
    // the user's earliest view, step i the earliest step-i event
    // STRICTLY after step i−1 — the product-analytics conversion chain.
    // The Spark side is ONE shuffle (per-user collect + sorted native
    // fold carrying the k step-times as HOF state); the oracle restates
    // the same greedy chain as a k-deep min-join cascade, which is
    // semantically identical (min over a sorted stream = first
    // qualifying element) but k shuffles — exactly the rewrite the
    // operator exists to avoid.
    "a12_funnel" -> Q(
      fn = (s, dir) =>
        graft.operators.TimeSeriesOps.funnel(
          t(s, dir, "events"), Seq("user_id"), "ts", "event_type",
          Seq("view", "click", "purchase"), tieBreak = Seq("event_id"))
          .orderBy(col("user_id")),
      oracle = Some("""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id, s1.t1 AS step_1, s2.t2 AS step_2,
               s3.t3 AS step_3,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS steps_completed
        FROM u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
        ORDER BY u.user_id""")),

    // A13 — KMV distinct-count sketch (k = 32) of event ids per type,
    // alongside the exact count it approximates. KMV over a
    // deterministic md5-derived hash is bit-reproducible across engines
    // (HLL register layouts are not — which is why THIS sketch gets an
    // oracle row and approx_count_distinct never could), mergeable by
    // union+re-cut, and fixed-size. The oracle restates hash → distinct
    // → per-group 32 smallest → (k−1)·2^60/h(k) with the same 60-bit
    // md5-fold fragment the MinHash oracles use.
    "a13_kmv_distinct" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val sk = graft.operators.SketchOps.kmvSketch(
          ev, Seq("event_type"), "event_id", k = 32)
        val est = graft.operators.SketchOps.kmvEstimate(
          sk, Seq("event_type"), k = 32)
        val exact = ev.groupBy(col("event_type"))
          .agg(count_distinct(col("event_id")).as("exact_distinct"))
        est.join(exact, "event_type")
          .select(col("event_type"), col("n_retained"),
            col("n_distinct_est"), col("exact_distinct"))
          .orderBy(col("event_type"))
      },
      oracle = Some(s"""
        WITH h AS (
          SELECT DISTINCT event_type,
            list_transform([CAST(event_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] AS hv
          FROM events),
        r AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rn
          FROM h),
        sk AS (
          SELECT event_type, list_sort(list(hv)) AS kmv
          FROM r WHERE rn <= 32 GROUP BY 1),
        ex AS (
          SELECT event_type, count(DISTINCT event_id) AS exact_distinct
          FROM events GROUP BY 1)
        SELECT sk.event_type,
               CAST(len(kmv) AS INT) AS n_retained,
               round(CASE WHEN len(kmv) < 32 THEN CAST(len(kmv) AS DOUBLE)
                     ELSE (CAST(31 AS DOUBLE) * pow(2, 60)) /
                          CAST(kmv[32] AS DOUBLE) END, 4)
                 AS n_distinct_est,
               ex.exact_distinct
        FROM sk JOIN ex ON sk.event_type = ex.event_type
        ORDER BY sk.event_type""")),

    // A25 — mergeable quantile sketch (the sketch family's fourth
    // member: KMV distinct / CMS frequency / Bloom membership /
    // bottom-k quantiles): per event_type, a deterministic bottom-64
    // row sample by md5(event_id) estimates value quantiles, checked
    // here against the exact ones. The estimate is an element PICK
    // from the sample (Type-1 quantile), not interpolation — one of
    // the input doubles untouched, so both engines agree bit-for-bit.
    // Build is a WindowGroupLimit-reduced shuffle; the query also
    // exercises the merge algebra: sketches built per half of the id
    // space fold into exactly the whole-frame sketch.
    "a25_quantile_sketch" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val sk = graft.operators.SketchOps.qMerge(
          graft.operators.SketchOps.qSketch(
            ev.filter(col("event_id") % 2 === 0),
            Seq("event_type"), "event_id", "value", k = 64)
            .union(graft.operators.SketchOps.qSketch(
              ev.filter(col("event_id") % 2 === 1),
              Seq("event_type"), "event_id", "value", k = 64)),
          Seq("event_type"), k = 64)
        val est = graft.operators.SketchOps.qEstimate(
          sk, Seq("event_type"), Seq(0.25, 0.5, 0.75, 0.9))
        val exact = ev.groupBy(col("event_type"))
          .agg(round(percentile(col("value"), lit(0.25)), 6).as("e25"),
            round(percentile(col("value"), lit(0.5)), 6).as("e50"),
            round(percentile(col("value"), lit(0.75)), 6).as("e75"),
            round(percentile(col("value"), lit(0.9)), 6).as("e90"))
          .select(col("event_type"),
            expr("stack(4, 0.25d, e25, 0.5d, e50, 0.75d, e75, 0.9d, e90)" +
              " AS (q, exact_q)"))
        est.join(exact, Seq("event_type", "q"))
          .select(col("event_type"), col("q"), col("n_retained"),
            col("est"), col("exact_q"))
          .orderBy(col("event_type"), col("q"))
      },
      oracle = Some(s"""
        WITH h AS (
          SELECT event_type,
            list_transform([CAST(event_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] AS hv,
            value
          FROM events),
        r AS (
          SELECT event_type, hv, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rn
          FROM h),
        sk AS (
          SELECT event_type, list_sort(list(value)) AS vals,
                 CAST(count(*) AS INT) AS n_retained
          FROM r WHERE rn <= 64 GROUP BY 1),
        ex0 AS (
          SELECT event_type,
                 round(quantile_cont(value, 0.25), 6) AS e25,
                 round(quantile_cont(value, 0.50), 6) AS e50,
                 round(quantile_cont(value, 0.75), 6) AS e75,
                 round(quantile_cont(value, 0.90), 6) AS e90
          FROM events GROUP BY 1),
        ex AS (
          SELECT event_type, CAST(0.25 AS DOUBLE) AS q, e25 AS exact_q
          FROM ex0
          UNION ALL SELECT event_type, CAST(0.5 AS DOUBLE), e50 FROM ex0
          UNION ALL SELECT event_type, CAST(0.75 AS DOUBLE), e75 FROM ex0
          UNION ALL SELECT event_type, CAST(0.9 AS DOUBLE), e90 FROM ex0)
        SELECT sk.event_type, ex.q, sk.n_retained,
               vals[CAST(greatest(1, ceil(ex.q * n_retained)) AS INT)]
                 AS est,
               ex.exact_q
        FROM sk JOIN ex ON ex.event_type = sk.event_type
        ORDER BY sk.event_type, ex.q""")),

    // A14 — day-granularity cohort retention on events: cohort = date of
    // a user's first event, cell (cohort, offset) = distinct users from
    // that cohort active `offset` days later, plus retention vs the
    // cohort's day-0 size. Spark side is two reduced shuffles (min-ts
    // window co-located by user, then map-side-distinct count); the
    // oracle restates first-seen as a per-user min + join.
    "a14_cohort_retention" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps.cohortRetention(
          t(s, dir, "events"), "user_id", "ts", "day")
          .orderBy(col("cohort"), col("period_offset")),
      oracle = Some("""
        WITH f AS (
          SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE)
                   AS cohort
          FROM events GROUP BY 1),
        cells AS (
          SELECT f.cohort,
                 CAST(date_diff('day', f.cohort,
                   CAST(date_trunc('day', e.ts) AS DATE)) AS INT)
                   AS period_offset,
                 count(DISTINCT e.user_id) AS n_active
          FROM events e JOIN f ON e.user_id = f.user_id
          GROUP BY 1, 2)
        SELECT cohort, period_offset, n_active,
               round(CAST(n_active AS DOUBLE) /
                 first_value(n_active) OVER (PARTITION BY cohort
                   ORDER BY period_offset) * 100.0, 4) AS retention_pct
        FROM cells
        ORDER BY cohort, period_offset""")),

    // A15 — count-min sketch (depth 4, width 64) of per-user event
    // frequency, point-estimated for every user against the exact
    // count. The affine bucket family is the MinHash permutation family
    // mod width, so the sketch is deterministic and the whole counter
    // matrix is restatable in SQL — the reproducibility property that
    // lets a frequency sketch be oracle-checked at all. 150 users into
    // 64 buckets forces real collisions: the estimates strictly
    // dominate the exact counts (CMS never underestimates), visible in
    // the data.
    "a15_cms_freq" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val sk = graft.operators.SketchOps.cmsSketch(
          ev, Nil, "user_id", depth = 4, width = 64)
        val est = graft.operators.SketchOps.cmsEstimate(
          ev.select(col("user_id")).distinct(), sk, Nil, "user_id",
          depth = 4, width = 64)
        val exact = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("exact_freq"))
        est.join(exact, "user_id")
          .select(col("user_id"), col("est_freq"), col("exact_freq"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH u AS (
          SELECT user_id, count(*) AS n,
            list_transform([CAST(user_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] % 2147483647 AS hv
          FROM events GROUP BY user_id),
        b AS (
          SELECT u.user_id, u.n, d.dn,
                 ((2 * d.dn + 3) * u.hv + (7 * d.dn + 1))
                   % 2147483647 % 64 AS bucket
          FROM u CROSS JOIN (
            SELECT unnest(generate_series(0, 3)) AS dn) d),
        c AS (
          SELECT dn, bucket, CAST(sum(n) AS BIGINT) AS cnt
          FROM b GROUP BY 1, 2)
        SELECT b.user_id, min(c.cnt) AS est_freq, min(b.n) AS exact_freq
        FROM b JOIN c ON b.dn = c.dn AND b.bucket = c.bucket
        GROUP BY 1
        ORDER BY 1""")),

    // A42 — Misra-Gries heavy hitters (k=20) of user_id per event_type,
    // INCLUDING the merge algebra: two disjoint per-half builds fold
    // into one summary (counter-add, re-trim, SUMMED error bounds —
    // mergeable-summaries), then every retained item reports its
    // deterministic bracket est_lo ≤ true ≤ est_hi against the exact
    // count. CMS (a15) answers "how often did X occur" probabilistically
    // with fixed-width collisions; MG answers "what are the frequent
    // items" with a deterministic n/k bound and k−1 counters — the
    // batch twin of heavyHittersStream. The trim is deterministic
    // (count desc, item asc; c(k) subtraction), so the whole summary —
    // and the error bound itself — is restatable in SQL.
    "a42_mg_topk" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val keys = Seq("event_type")
        val parts = graft.operators.SketchOps.mgSketch(
          ev.filter(col("event_id") % 2 === 0), keys, "user_id", k = 20)
          .union(graft.operators.SketchOps.mgSketch(
            ev.filter(col("event_id") % 2 === 1), keys, "user_id",
            k = 20))
        val sk = graft.operators.SketchOps.mgMerge(parts, keys, k = 20)
        val est = graft.operators.SketchOps.mgEstimate(sk, keys)
        val exact = ev.groupBy(col("event_type"),
          col("user_id").cast("string").as("item"))
          .agg(count(lit(1)).as("exact_freq"))
        est.join(exact, Seq("event_type", "item"))
          .select(col("event_type"), col("item"), col("est_lo"),
            col("est_hi"), col("mg_n"), col("exact_freq"))
          .orderBy(col("event_type"), col("item"))
      },
      bench = true,
      oracle = Some("""
        WITH c0 AS (
          SELECT event_type, CAST(user_id AS VARCHAR) AS item,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
        r0 AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY cnt DESC, item) AS rn
          FROM c0),
        k0 AS (
          SELECT event_type,
                 coalesce(max(CASE WHEN rn = 20 THEN cnt END),
                          CAST(0 AS BIGINT)) AS ck,
                 CAST(sum(cnt) AS BIGINT) AS n
          FROM r0 GROUP BY 1),
        s0 AS (
          SELECT r.event_type, r.item, r.cnt - k.ck AS est
          FROM r0 r JOIN k0 k USING (event_type)
          WHERE r.rn <= 19 AND r.cnt > k.ck),
        c1 AS (
          SELECT event_type, CAST(user_id AS VARCHAR) AS item,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
        r1 AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY cnt DESC, item) AS rn
          FROM c1),
        k1 AS (
          SELECT event_type,
                 coalesce(max(CASE WHEN rn = 20 THEN cnt END),
                          CAST(0 AS BIGINT)) AS ck,
                 CAST(sum(cnt) AS BIGINT) AS n
          FROM r1 GROUP BY 1),
        s1 AS (
          SELECT r.event_type, r.item, r.cnt - k.ck AS est
          FROM r1 r JOIN k1 k USING (event_type)
          WHERE r.rn <= 19 AND r.cnt > k.ck),
        m AS (
          SELECT event_type, item, CAST(sum(est) AS BIGINT) AS cnt
          FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1)
          GROUP BY 1, 2),
        rm AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY cnt DESC, item) AS rn
          FROM m),
        km AS (
          SELECT event_type,
                 coalesce(max(CASE WHEN rn = 20 THEN cnt END),
                          CAST(0 AS BIGINT)) AS ck
          FROM rm GROUP BY 1),
        meta AS (
          SELECT k0.event_type, k0.ck + k1.ck + km.ck AS mg_err,
                 k0.n + k1.n AS mg_n
          FROM k0 JOIN k1 USING (event_type) JOIN km USING (event_type)),
        sm AS (
          SELECT r.event_type, r.item, r.cnt - km.ck AS est
          FROM rm r JOIN km USING (event_type)
          WHERE r.rn <= 19 AND r.cnt > km.ck),
        ex AS (
          SELECT event_type, CAST(user_id AS VARCHAR) AS item,
                 CAST(count(*) AS BIGINT) AS exact_freq
          FROM events GROUP BY 1, 2)
        SELECT s.event_type, s.item, s.est AS est_lo,
               s.est + meta.mg_err AS est_hi, meta.mg_n, ex.exact_freq
        FROM sm s
        JOIN meta USING (event_type)
        JOIN ex ON ex.event_type = s.event_type AND ex.item = s.item
        ORDER BY s.event_type, s.item""")),

    // A48 — JOIN-SIZE estimation from two CMS sketches (Cormode &
    // Muthukrishnan 2005 §4.2): per depth, Σ_b cntA[b]·cntB[b] never
    // undercounts |orders ⋈ customer| (true pairs share buckets;
    // collisions only add) and min-across-depths is the estimate —
    // the cardinality answer a planner needs BEFORE choosing a
    // shuffle strategy, from two d·w summaries instead of a pass over
    // either table. The estimate and the exact join count ship side
    // by side so the overestimate factor is hashed output, not
    // folklore. All counters and inner products assemble in BIGINT;
    // the ratio is one division.
    "a48_join_size_est" -> Q(
      fn = (s, dir) => {
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val skA = graft.operators.SketchOps.cmsSketch(
          ord, Nil, "o_custkey", depth = 4, width = 64)
        val skB = graft.operators.SketchOps.cmsSketch(
          cust.select(col("c_custkey").as("o_custkey")), Nil, "o_custkey",
          depth = 4, width = 64)
        val est = graft.operators.SketchOps.cmsJoinSize(skA, skB, Nil)
        val exact = ord
          .join(cust, col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("exact_join_size"))
        est.crossJoin(broadcast(exact))
          .select(col("est_join_size"), col("exact_join_size"),
            round(col("est_join_size").cast("double") /
              col("exact_join_size").cast("double"), 6)
              .as("overestimate"))
      },
      oracle = Some(s"""
        WITH av AS (
          SELECT o_custkey AS k, count(*) AS n,
            list_transform([CAST(o_custkey AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] % 2147483647 AS hv
          FROM orders GROUP BY o_custkey),
        ab AS (
          SELECT d.dn,
                 ((2 * d.dn + 3) * av.hv + (7 * d.dn + 1))
                   % 2147483647 % 64 AS bucket,
                 CAST(sum(av.n) AS BIGINT) AS cnt
          FROM av CROSS JOIN (
            SELECT unnest(generate_series(0, 3)) AS dn) d
          GROUP BY 1, 2),
        bv AS (
          SELECT c_custkey AS k, count(*) AS n,
            list_transform([CAST(c_custkey AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] % 2147483647 AS hv
          FROM customer GROUP BY c_custkey),
        bb AS (
          SELECT d.dn,
                 ((2 * d.dn + 3) * bv.hv + (7 * d.dn + 1))
                   % 2147483647 % 64 AS bucket,
                 CAST(sum(bv.n) AS BIGINT) AS cnt
          FROM bv CROSS JOIN (
            SELECT unnest(generate_series(0, 3)) AS dn) d
          GROUP BY 1, 2),
        ip AS (
          SELECT ab.dn, CAST(sum(ab.cnt * bb.cnt) AS BIGINT) AS ip
          FROM ab JOIN bb ON bb.dn = ab.dn AND bb.bucket = ab.bucket
          GROUP BY 1),
        est AS (
          SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM ip),
        ex AS (
          SELECT CAST(count(*) AS BIGINT) AS exact_join_size
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
        SELECT est_join_size, exact_join_size,
               round(CAST(est_join_size AS DOUBLE)
                 / CAST(exact_join_size AS DOUBLE), 6) AS overestimate
        FROM est CROSS JOIN ex""")),

    // A49 — inter-arrival BURSTINESS per event type: per-user gap
    // sequences (one lag over the (user, type) window), then CV² =
    // n·Σg²/(Σg)² − 1 and the Goh–Barabási burstiness index
    // (CV−1)/(CV+1) — ≈ 0/≈ −1/→ 1 for Poisson/periodic/bursty
    // arrivals, the shape statistic a rate-limit or capacity plan
    // actually needs (a30's EWMA tracks level; this says whether the
    // level arrives smoothly or in spikes). Gap moments assemble as
    // BIGINT/DECIMAL(38,0) micros (g² at day-scale gaps overflows
    // BIGINT — hence the decimal square); the CV² float expression is
    // the same mult/div/sub sequence on both engines, then one round.
    "a49_burstiness" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val g = t(s, dir, "events")
          .select(col("event_type"),
            (unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(w)).as("g"))
          .filter(col("g").isNotNull)
        val cv2 = round(
          (col("n_gaps").cast("double") * col("sg2").cast("double")) /
            (col("sg").cast("double") * col("sg").cast("double")) -
            lit(1.0), 9)
        g.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("g")).as("sg"),
            sum(col("g").cast("decimal(38,0)") *
              col("g").cast("decimal(38,0)")).as("sg2"))
          .select(col("event_type"), col("n_gaps"),
            round(col("sg").cast("double") /
              (col("n_gaps") * lit(1000000L)).cast("double"), 6)
              .as("mean_gap_s"),
            cv2.as("cv2"))
          .withColumn("burstiness",
            round((sqrt(col("cv2")) - lit(1.0)) /
              (sqrt(col("cv2")) + lit(1.0)), 6))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS g
          FROM events),
        a AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
                 CAST(sum(g) AS BIGINT) AS sg,
                 sum(CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0)))
                   AS sg2
          FROM g WHERE g IS NOT NULL GROUP BY 1),
        c AS (
          SELECT event_type, n_gaps,
                 round(CAST(sg AS DOUBLE)
                   / CAST(n_gaps * 1000000 AS DOUBLE), 6) AS mean_gap_s,
                 round((CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE))
                   / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                   - 1.0, 9) AS cv2
          FROM a)
        SELECT event_type, n_gaps, mean_gap_s, cv2,
               round((sqrt(cv2) - 1.0) / (sqrt(cv2) + 1.0), 6)
                 AS burstiness
        FROM c ORDER BY event_type""")),

    // A50 — CHANGEPOINT per event type (binary segmentation, one
    // split): the day t maximizing |S_t|, S_t = n·prefix_t − t·total
    // over daily counts — the centered-CUSUM statistic, which for a
    // single mean shift is the least-squares split point. a33 tracks
    // the running drift; this NAMES the day the level changed and
    // reports both segment means. The statistic is ENTIRELY BIGINT
    // (counts, prefix sums, the n·prefix − t·total bilinear) — no
    // float enters until the two segment-mean divisions at the end,
    // so argmax ties (abs desc, earliest day) are exact, not
    // ulp-dependent. One day-grain groupBy + one per-type window.
    "a50_changepoint" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val tot = daily.groupBy(col("event_type"))
          .agg(sum(col("x")).as("total"), count(lit(1)).as("n_days"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val wPick = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("s_t")).desc, col("day").asc)
        daily
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("prefix",
            sum(col("x")).over(
              wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .join(tot, "event_type")
          .withColumn("s_t",
            col("n_days") * col("prefix") - col("t") * col("total"))
          .filter(col("t") < col("n_days"))
          .withColumn("rk", row_number().over(wPick))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("day").as("cp_day"),
            col("n_days"), col("t").as("cp_t"),
            abs(col("s_t")).as("cusum_stat"),
            round(col("prefix").cast("double") / col("t").cast("double"), 6)
              .as("mean_before"),
            round((col("total") - col("prefix")).cast("double") /
              (col("n_days") - col("t")).cast("double"), 6)
              .as("mean_after"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        tt AS (
          SELECT event_type, CAST(sum(x) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY 1),
        pre AS (
          SELECT d.event_type, d.day,
                 CAST(row_number() OVER (PARTITION BY d.event_type
                   ORDER BY d.day) AS BIGINT) AS t,
                 CAST(sum(d.x) OVER (PARTITION BY d.event_type
                   ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS prefix,
                 tt.total, tt.n_days
          FROM daily d JOIN tt USING (event_type)),
        s AS (
          SELECT *, n_days * prefix - t * total AS s_t FROM pre),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(s_t) DESC, day) AS rk
          FROM s WHERE t < n_days)
        SELECT event_type, day AS cp_day, n_days, t AS cp_t,
               CAST(abs(s_t) AS BIGINT) AS cusum_stat,
               round(CAST(prefix AS DOUBLE) / CAST(t AS DOUBLE), 6)
                 AS mean_before,
               round(CAST(total - prefix AS DOUBLE)
                 / CAST(n_days - t AS DOUBLE), 6) AS mean_after
        FROM r WHERE rk = 1
        ORDER BY event_type""")),

    // A51 — WELCH'S T-TEST between two event cohorts (click vs view on
    // `value`): the unequal-variance two-sample test an A/B readout
    // needs. Moments assemble exactly — value casts to decimal(18,6)
    // (the dimStats convention), s1/s2 sum in decimal so no float-
    // addition order exists — and the derived chain (mean, sample var,
    // standard error, t, Welch–Satterthwaite df) is the identical
    // sequence of IEEE double ops on both engines from those exact
    // operands, rounded once at the end. One partial-aggregable
    // groupBy over the filtered scan, then a 2-row pivot — nothing
    // driver-side, scales as a scan.
    "a51_welch_ttest" -> Q(
      fn = (s, dir) => {
        val dec = col("value").cast("decimal(18,6)")
        val g = t(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec).as("s1"),
            sum((dec * dec).cast("decimal(38,12)")).as("s2"))
          .select(col("event_type"),
            col("n"),
            (col("s1").cast("double") / col("n").cast("double")).as("m"),
            // the a49 discipline: exact decimal sums cast to double
            // ONCE, then a fixed all-double chain (decimal products of
            // two (38,·) operands would hit Spark's precision clamp)
            ((col("n").cast("double") * col("s2").cast("double") -
              col("s1").cast("double") * col("s1").cast("double")) /
              (col("n").cast("double") *
                (col("n") - 1).cast("double"))).as("v"))
        val a = g.filter(col("event_type") === "click")
          .select(col("n").as("na"), col("m").as("ma"), col("v").as("va"))
        val b = g.filter(col("event_type") === "view")
          .select(col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
        val sa = col("va") / col("na").cast("double")
        val sb = col("vb") / col("nb").cast("double")
        a.crossJoin(b)
          .select(
            col("na"), col("nb"),
            round(col("ma"), 6).as("mean_click"),
            round(col("mb"), 6).as("mean_view"),
            round((col("ma") - col("mb")) / sqrt(sa + sb), 6).as("t_stat"),
            round((sa + sb) * (sa + sb) /
              (sa * sa / (col("na") - 1).cast("double") +
                sb * sb / (col("nb") - 1).cast("double")), 3).as("df"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(value AS DECIMAL(18,6))) AS s1,
                 sum(CAST(CAST(value AS DECIMAL(18,6))
                     * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12)))
                   AS s2
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY 1),
        m AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                 (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS v
          FROM g),
        a AS (SELECT n AS na, m AS ma, v AS va FROM m
              WHERE event_type = 'click'),
        b AS (SELECT n AS nb, m AS mb, v AS vb FROM m
              WHERE event_type = 'view')
        SELECT na, nb,
               round(ma, 6) AS mean_click,
               round(mb, 6) AS mean_view,
               round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
               round((va / na + vb / nb) * (va / na + vb / nb)
                 / ((va / na) * (va / na) / (na - 1)
                    + (vb / nb) * (vb / nb) / (nb - 1)), 3) AS df
        FROM a CROSS JOIN b""")),

    // A52 — KAPLAN–MEIER survival of signup→purchase conversion time:
    // per user, duration (whole days) from first signup to first
    // subsequent purchase; users who never purchase are right-censored
    // at the corpus end. At each event day d: n_at_risk = users with
    // duration ≥ d, deaths = uncensored durations = d, and
    // S(d) = Π (1 − deaths/n_risk). The product replays cross-engine
    // through the exp-Σln form: each factor's ln rounds to 12 dp, the
    // cumulative sum folds in DECIMAL (order-free), exp at the end,
    // round 6 — sum error ~1e-11 stays far from the 6-dp half-ulp, the
    // t26/kmeansFit argument. A day where everyone at risk dies has
    // ln(0) = −∞ (Spark log returns NULL there): an integer
    // zero-factor flag carries through the same window instead, and
    // S pins to exactly 0 from that day on. Shapes: two tiny windows
    // over per-user rows, then day-grain aggregation — scan-dominated.
    "a52_survival_km" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
        val end = ev.agg(max(col("ts")).as("t_end"))
        val pu = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("__uid"), col("ts").as("tp"))
        // the ts >= t0 guard lives in the JOIN condition: a user whose
        // purchases all predate signup must stay (censored), not vanish
        val dur = su
          .join(pu,
            col("__uid") === col("user_id") && col("tp") >= col("t0"),
            "left")
          .groupBy(col("user_id"), col("t0"))
          .agg(min(col("tp")).as("tp"))
          .crossJoin(broadcast(end))
          .select(col("user_id"),
            when(col("tp").isNotNull,
              floor((unix_micros(col("tp")) - unix_micros(col("t0"))) /
                lit(86400000000L)).cast("bigint"))
              .otherwise(
                floor((unix_micros(col("t_end")) - unix_micros(col("t0"))) /
                  lit(86400000000L)).cast("bigint")).as("dur"),
            col("tp").isNotNull.as("observed"))
        val days = dur
          .groupBy(col("dur").as("day"))
          .agg(count(lit(1)).as("n_ending"),
            sum(when(col("observed"), 1L).otherwise(0L)).as("deaths"))
        val wOrd = Window.orderBy(col("day"))
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        val total = dur.agg(count(lit(1)).as("n_total"))
        days
          .crossJoin(broadcast(total))
          .withColumn("ended_before",
            coalesce(sum(col("n_ending"))
              .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .withColumn("n_risk", col("n_total") - col("ended_before"))
          .filter(col("deaths") > 0)
          .withColumn("lnf",
            when(col("deaths") < col("n_risk"),
              round(log(
                (col("n_risk") - col("deaths")).cast("double") /
                  col("n_risk").cast("double")), 12)
                .cast("decimal(24,12)"))
              .otherwise(lit(null).cast("decimal(24,12)")))
          .withColumn("zeroed",
            sum(when(col("deaths") >= col("n_risk"), 1L).otherwise(0L))
              .over(wCum))
          .withColumn("survival",
            when(col("zeroed") > 0, lit(0.0))
              .otherwise(round(exp(
                sum(col("lnf")).over(wCum).cast("double")), 6)))
          .select(col("day"), col("n_risk"), col("deaths"), col("survival"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH su AS (
          SELECT user_id, min(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        fin AS (SELECT max(ts) AS t_end FROM events),
        dur AS (
          SELECT s.user_id,
                 CASE WHEN min(p.ts) IS NOT NULL
                      THEN CAST(floor((epoch_us(min(p.ts))
                             - epoch_us(s.t0)) / 86400000000) AS BIGINT)
                      ELSE CAST(floor((epoch_us(f.t_end)
                             - epoch_us(s.t0)) / 86400000000) AS BIGINT)
                 END AS dur,
                 min(p.ts) IS NOT NULL AS observed
          FROM su s CROSS JOIN fin f
          LEFT JOIN (SELECT user_id, ts FROM events
                     WHERE event_type = 'purchase') p
            ON p.user_id = s.user_id AND p.ts >= s.t0
          GROUP BY s.user_id, s.t0, f.t_end),
        days AS (
          SELECT dur AS day, CAST(count(*) AS BIGINT) AS n_ending,
                 CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS deaths
          FROM dur GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM dur),
        risk AS (
          SELECT d.day, d.deaths,
                 t.n_total - CAST(coalesce(sum(d.n_ending) OVER (
                     ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS n_risk
          FROM days d CROSS JOIN tot t),
        f AS (
          SELECT day, n_risk, deaths,
                 CASE WHEN deaths < n_risk
                      THEN CAST(round(ln(CAST(n_risk - deaths AS DOUBLE)
                             / CAST(n_risk AS DOUBLE)), 12)
                           AS DECIMAL(24,12)) END AS lnf,
                 CASE WHEN deaths >= n_risk THEN 1 ELSE 0 END AS z
          FROM risk WHERE deaths > 0),
        c AS (
          SELECT day, n_risk, deaths,
                 sum(lnf) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
                 CAST(sum(z) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS zeroed
          FROM f)
        SELECT day, n_risk, deaths,
               CASE WHEN zeroed > 0 THEN 0.0
                    ELSE round(exp(CAST(s AS DOUBLE)), 6) END AS survival
        FROM c ORDER BY day""")),

    // J15 — ALLEN INTERVAL RELATIONS between each user's click span
    // and view span ([first, last] event per type): the 13-relation
    // temporal algebra (before/meets/overlaps/starts/during/finishes/
    // equals + inverses) that interval reasoning over sessions,
    // outages, or annotation spans needs. One groupBy builds both
    // spans, one broadcast-sized join pairs them per user, and the
    // classification is a pure CASE chain over four timestamp
    // compares — written in the identical guard order on both engines
    // so every row takes the same branch. Output: relation → users.
    "j15_allen_relations" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        def span(tp: String, pre: String) =
          ev.filter(col("event_type") === tp)
            .groupBy(col("user_id"))
            .agg(min(col("ts")).as(pre + "s"), max(col("ts")).as(pre + "e"))
        val rel =
          when(col("ae") < col("bs"), "before")
            .when(col("ae") === col("bs"), "meets")
            .when(col("as") > col("be"), "after")
            .when(col("as") === col("be"), "met_by")
            .when(col("as") === col("bs") && col("ae") === col("be"),
              "equals")
            .when(col("as") === col("bs"),
              when(col("ae") < col("be"), "starts").otherwise("started_by"))
            .when(col("ae") === col("be"),
              when(col("as") > col("bs"), "finishes")
                .otherwise("finished_by"))
            .when(col("as") > col("bs") && col("ae") < col("be"), "during")
            .when(col("as") < col("bs") && col("ae") > col("be"),
              "contains")
            .when(col("as") < col("bs"), "overlaps")
            .otherwise("overlapped_by")
        span("click", "a").join(span("view", "b"), "user_id")
          .select(rel.as("relation"))
          .groupBy(col("relation"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("relation"))
      },
      oracle = Some("""
        WITH a AS (
          SELECT user_id, min(ts) AS "as", max(ts) AS ae FROM events
          WHERE event_type = 'click' GROUP BY 1),
        b AS (
          SELECT user_id, min(ts) AS bs, max(ts) AS be FROM events
          WHERE event_type = 'view' GROUP BY 1),
        r AS (
          SELECT CASE
                   WHEN a.ae < b.bs THEN 'before'
                   WHEN a.ae = b.bs THEN 'meets'
                   WHEN a."as" > b.be THEN 'after'
                   WHEN a."as" = b.be THEN 'met_by'
                   WHEN a."as" = b.bs AND a.ae = b.be THEN 'equals'
                   WHEN a."as" = b.bs THEN
                     CASE WHEN a.ae < b.be THEN 'starts'
                          ELSE 'started_by' END
                   WHEN a.ae = b.be THEN
                     CASE WHEN a."as" > b.bs THEN 'finishes'
                          ELSE 'finished_by' END
                   WHEN a."as" > b.bs AND a.ae < b.be THEN 'during'
                   WHEN a."as" < b.bs AND a.ae > b.be THEN 'contains'
                   WHEN a."as" < b.bs THEN 'overlaps'
                   ELSE 'overlapped_by'
                 END AS relation
          FROM a JOIN b USING (user_id))
        SELECT relation, CAST(count(*) AS BIGINT) AS n_users
        FROM r GROUP BY 1 ORDER BY relation""")),

    // A58 — DIFFERENCE-IN-DIFFERENCES: the causal-effect baseline
    // when assignment isn't randomized — effect = (treated post −
    // treated pre) − (control post − control pre) over per-arm,
    // per-period purchase means (same arms/periods as a57, so the
    // experimentation kit reads off one fixture). One conditional
    // partial-aggregated scan into a 4-cell frame; means are one
    // division each from exact decimal sums, the DiD combination is
    // a fixed double chain rounded once.
    "a58_diff_in_diff" -> Q(
      fn = (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val cells = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(pmod(col("user_id"), lit(2)).as("arm"),
            (col("ts") >= cut).as("post"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).as("s"))
          .select(col("arm"), col("post"),
            (col("s").cast("double") / col("n").cast("double"))
              .as("m"))
        def cell(a: Int, p: Boolean) =
          min(when(col("arm") === a && col("post") === p, col("m")))
        cells.agg(
            cell(1, true).as("t_post"), cell(1, false).as("t_pre"),
            cell(0, true).as("c_post"), cell(0, false).as("c_pre"))
          .select(
            round(col("t_pre"), 6).as("treated_pre"),
            round(col("t_post"), 6).as("treated_post"),
            round(col("c_pre"), 6).as("control_pre"),
            round(col("c_post"), 6).as("control_post"),
            round((col("t_post") - col("t_pre")) -
              (col("c_post") - col("c_pre")), 6).as("did_effect"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT user_id % 2 AS arm,
                 ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS m
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, 2),
        w AS (
          SELECT
            min(CASE WHEN arm = 1 AND post THEN m END) AS t_post,
            min(CASE WHEN arm = 1 AND NOT post THEN m END) AS t_pre,
            min(CASE WHEN arm = 0 AND post THEN m END) AS c_post,
            min(CASE WHEN arm = 0 AND NOT post THEN m END) AS c_pre
          FROM cells)
        SELECT round(t_pre, 6) AS treated_pre,
               round(t_post, 6) AS treated_post,
               round(c_pre, 6) AS control_pre,
               round(c_post, 6) AS control_post,
               round((t_post - t_pre) - (c_post - c_pre), 6)
                 AS did_effect
        FROM w""")),

    // A57 — CUPED variance reduction (Deng et al. 2013): the
    // experimentation readout a51's raw t-test feeds into — per-user
    // pre-period purchase value (days < Jan 16) as the covariate,
    // post-period as the metric, θ = cov(x,y)/var(x) pooled, adjusted
    // mean per arm = ȳ_g − θ·(x̄_g − x̄). Per-user sums fold as exact
    // decimals; the pooled moments take the c25 discipline (doubles
    // from exact decimals, products rounded to 12 dp and re-folded as
    // decimals — no float-order anywhere); θ and the adjusted means
    // are one fixed all-double chain. Also reports the variance-
    // reduction factor 1 − var(y−θx)/var(y) — the number that says
    // whether the covariate was worth collecting. Everything is two
    // user-grain groupBys + O(1)-row frames.
    "a57_cuped" -> Q(
      fn = (s, dir) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val per = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < cut,
              col("value").cast("decimal(18,6)"))).as("xd"),
            sum(when(col("ts") >= cut,
              col("value").cast("decimal(18,6)"))).as("yd"))
          .select(col("user_id"),
            pmod(col("user_id"), lit(2)).as("arm"),
            coalesce(col("xd").cast("double"), lit(0.0)).as("x"),
            coalesce(col("yd").cast("double"), lit(0.0)).as("y"))
        val dec12 = (c: Column) => round(c, 12).cast("decimal(28,12)")
        val mom = per.agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(18,6)")).as("sx"),
          sum(col("y").cast("decimal(18,6)")).as("sy"),
          sum(dec12(col("x") * col("x"))).as("sxx"),
          sum(dec12(col("x") * col("y"))).as("sxy"),
          sum(dec12(col("y") * col("y"))).as("syy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val theta = (nD * col("sxy").cast("double") - sxD * syD) /
          (nD * col("sxx").cast("double") - sxD * sxD)
        val varY = (nD * col("syy").cast("double") - syD * syD) /
          (nD * (nD - 1))
        val varAdj = varY -
          ((nD * col("sxy").cast("double") - sxD * syD) /
            (nD * (nD - 1))) * theta
        val pooled = mom.select(
          theta.as("theta"), (sxD / nD).as("mx"),
          (lit(1.0) - varAdj / varY).as("vr"))
        per.groupBy(col("arm"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("x").cast("decimal(18,6)")).as("gx"),
            sum(col("y").cast("decimal(18,6)")).as("gy"))
          .crossJoin(broadcast(pooled))
          .select(col("arm"), col("n_users"),
            round(col("gy").cast("double") /
              col("n_users").cast("double"), 6).as("mean_y"),
            round(col("gy").cast("double") /
              col("n_users").cast("double") -
              col("theta") *
                (col("gx").cast("double") /
                  col("n_users").cast("double") - col("mx")), 6)
              .as("mean_y_cuped"),
            round(col("theta"), 6).as("theta"),
            round(col("vr"), 6).as("variance_reduction"))
          .orderBy(col("arm"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT user_id, user_id % 2 AS arm,
                 coalesce(CAST(sum(CASE WHEN ts < TIMESTAMP
                     '2024-01-16 00:00:00'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE),
                   0.0) AS x,
                 coalesce(CAST(sum(CASE WHEN ts >= TIMESTAMP
                     '2024-01-16 00:00:00'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE),
                   0.0) AS y
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, 2),
        mom AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(round(x * x, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxx,
                 CAST(sum(CAST(round(x * y, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxy,
                 CAST(sum(CAST(round(y * y, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS syy
          FROM per),
        pooled AS (
          SELECT (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx) AS theta,
                 sx / CAST(n AS DOUBLE) AS mx,
                 1.0 - ((CAST(n AS DOUBLE) * syy - sy * sy)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
                   - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                     * ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)))
                   / ((CAST(n AS DOUBLE) * syy - sy * sy)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                   AS vr
          FROM mom),
        g AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS gx,
                 CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS gy
          FROM per GROUP BY 1)
        SELECT arm, n_users,
               round(gy / n_users, 6) AS mean_y,
               round(gy / n_users
                 - p.theta * (gx / n_users - p.mx), 6) AS mean_y_cuped,
               round(p.theta, 6) AS theta,
               round(p.vr, 6) AS variance_reduction
        FROM g CROSS JOIN pooled p
        ORDER BY arm""")),

    // A56 — SESSION BOUNCE RATE: sessions by the 30-minute gap rule
    // (a7's sessionization windows), then the share that contain
    // exactly one event plus the mean session size — the engagement
    // headline a7's per-session rows feed. Two windows over one
    // user-keyed sort (lag for the gap, running sum for the session
    // id — the islands discipline), one partial-aggregable rollup;
    // all BIGINT until two final divisions.
    "a56_bounce_rate" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("gap_us",
            unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("brk",
            when(col("gap_us").isNull ||
              col("gap_us") > lit(1800000000L), 1L).otherwise(0L))
          .withColumn("sid",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)))
        ev.groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L))
              .as("n_bounce"),
            sum(col("n_events")).as("tot_events"))
          .select(col("n_sessions"), col("n_bounce"),
            round(col("n_bounce").cast("double") /
              col("n_sessions").cast("double"), 6).as("bounce_rate"),
            round(col("tot_events").cast("double") /
              col("n_sessions").cast("double"), 6)
              .as("mean_session_events"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events),
        s AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN gap_us IS NULL
                                 OR gap_us > 1800000000
                               THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sid
          FROM g),
        sess AS (
          SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
          FROM s GROUP BY 1, 2),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                 CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_bounce,
                 CAST(sum(n_events) AS BIGINT) AS tot_events
          FROM sess)
        SELECT n_sessions, n_bounce,
               round(CAST(n_bounce AS DOUBLE)
                 / CAST(n_sessions AS DOUBLE), 6) AS bounce_rate,
               round(CAST(tot_events AS DOUBLE)
                 / CAST(n_sessions AS DOUBLE), 6)
                 AS mean_session_events
        FROM agg""")),

    // J19 — BITEMPORAL AS-OF (valid time × system time): "what did
    // we BELIEVE on S the value was AT V" — the two-axis point query
    // s26's SCD-2 (system-time only) cannot answer, and the one that
    // makes corrections auditable (a late-arriving fact changes the
    // answer for old valid times only after its recorded_at). The
    // fact stream derives deterministically from events: valid_from
    // = ts, recorded_at = ts + (event_id mod 3) hours of ingest lag.
    // The pick is ONE window per user after the two inequality
    // filters — rows recorded by S, valid by V, latest valid_from
    // wins with recorded_at then event_id as the correction
    // tie-break (a later recording of the same valid instant
    // supersedes). One user-keyed exchange; the filters prune before
    // the sort.
    "j19_bitemporal_asof" -> Q(
      fn = (s, dir) => {
        val v = lit("2024-01-20 00:00:00").cast("timestamp")
        val sys = lit("2024-01-22 00:00:00").cast("timestamp")
        val facts = t(s, dir, "events")
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("value"),
            col("ts").as("valid_from"),
            timestamp_micros(unix_micros(col("ts")) +
              pmod(col("event_id"), lit(3)) * lit(3600000000L))
              .as("recorded_at"),
            col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from").desc, col("recorded_at").desc,
            col("event_id").desc)
        facts
          .filter(col("recorded_at") <= sys && col("valid_from") <= v)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("valid_from"), col("recorded_at"),
            round(col("value"), 6).as("value_at"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH facts AS (
          SELECT user_id, value, ts AS valid_from,
                 make_timestamp(epoch_us(ts)
                   + (event_id % 3) * 3600000000) AS recorded_at,
                 event_id
          FROM events WHERE event_type = 'view'),
        f AS (
          SELECT * FROM facts
          WHERE recorded_at <= TIMESTAMP '2024-01-22 00:00:00'
            AND valid_from <= TIMESTAMP '2024-01-20 00:00:00'),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY valid_from DESC, recorded_at DESC,
                            event_id DESC) AS rn
          FROM f)
        SELECT user_id, valid_from, recorded_at,
               round(value, 6) AS value_at
        FROM r WHERE rn = 1
        ORDER BY user_id""")),

    // J18 — EVENT-SEQUENCE PATTERN MATCH (MATCH_RECOGNIZE-lite):
    // each user's event history collapses to an ordered initial
    // string (s/c/v/p/e by ts, event_id — the a19 deterministic
    // listagg), and regex patterns over that string answer ordered-
    // sequence questions a12's fixed funnel can't: signup→…→click→
    // …→purchase in order, ≥2 CONSECUTIVE errors, repeat purchase.
    // Patterns stay in the Java-regex ∩ RE2 subset (the t36 rule).
    // One user-keyed groupBy builds the strings; the match pass is
    // in-row; output is a 3-row scorecard. At 100 TB the sequence
    // string is bounded by per-user event counts — the same growth
    // law as any sessionization.
    "j18_sequence_match" -> Q(
      fn = (s, dir) => {
        val seqs = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(concat_ws("", transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              substring(col("event_type"), 1, 1).as("i")))),
            x => x.getField("i"))).as("seq"))
        val pats = Seq(
          "s.*c.*p" -> "signup_then_click_then_purchase",
          "ee" -> "consecutive_errors",
          "p.*p" -> "repeat_purchase")
        val agg = seqs.agg(
          count(lit(1)).as("n_users"),
          pats.zipWithIndex.map { case ((p, _), i) =>
            sum(when(col("seq").rlike(p), 1L).otherwise(0L))
              .as(s"m$i")
          }: _*)
        agg.select(explode(array(pats.zipWithIndex.map {
            case ((p, name), i) =>
              struct(lit(name).as("pattern"), col("n_users"),
                col(s"m$i").as("n_matched"))
          }: _*)).as("r"))
          .select(col("r.pattern"), col("r.n_users"),
            col("r.n_matched"),
            round(col("r.n_matched").cast("double") /
              col("r.n_users").cast("double"), 6).as("share"))
          .orderBy(col("pattern"))
      },
      oracle = Some("""
        WITH seqs AS (
          SELECT user_id,
                 string_agg(substr(event_type, 1, 1), ''
                   ORDER BY ts, event_id) AS seq
          FROM events GROUP BY 1),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(CASE WHEN regexp_matches(seq, 's.*c.*p')
                   THEN 1 ELSE 0 END) AS BIGINT) AS m0,
                 CAST(sum(CASE WHEN regexp_matches(seq, 'ee')
                   THEN 1 ELSE 0 END) AS BIGINT) AS m1,
                 CAST(sum(CASE WHEN regexp_matches(seq, 'p.*p')
                   THEN 1 ELSE 0 END) AS BIGINT) AS m2
          FROM seqs),
        rows_ AS (
          SELECT 'signup_then_click_then_purchase' AS pattern,
                 n_users, m0 AS n_matched FROM m
          UNION ALL
          SELECT 'consecutive_errors', n_users, m1 FROM m
          UNION ALL
          SELECT 'repeat_purchase', n_users, m2 FROM m)
        SELECT pattern, n_users, n_matched,
               round(CAST(n_matched AS DOUBLE)
                 / CAST(n_users AS DOUBLE), 6) AS share
        FROM rows_ ORDER BY pattern""")),

    // A55 — FUNNEL STEP LATENCY QUANTILES: p50/p90 of the time spent
    // in each funnel transition (signup→first click after it, that
    // click→first purchase after it) — a12 counts who converts, this
    // says HOW LONG each hop takes, which is what a latency SLA or a
    // nurture-campaign trigger is tuned against. Quantiles are exact
    // type-1 order statistics over integer micros (the c23/a9
    // discipline — rank = ceil(p·n) via integer-safe floor
    // arithmetic, no interpolation midpoints by construction); the
    // micros convert to seconds with one division each. Per-user
    // step picks are two conditional min-joins; the quantile windows
    // partition by transition.
    "a55_step_latency" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
        val cl = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("__u1"), col("ts").as("tc"))
        val t1 = su.join(cl,
            col("__u1") === col("user_id") && col("tc") >= col("t0"))
          .groupBy(col("user_id"), col("t0"))
          .agg(min(col("tc")).as("t1"))
        val t2 = t1.join(
            ev.filter(col("event_type") === "purchase")
              .select(col("user_id").as("__u2"), col("ts").as("tp")),
            col("__u2") === col("user_id") && col("tp") >= col("t1"))
          .groupBy(col("user_id"), col("t0"), col("t1"))
          .agg(min(col("tp")).as("t2"))
        val lats =
          t1.select(lit("1_signup_to_click").as("transition"),
            col("user_id"),
            (unix_micros(col("t1")) - unix_micros(col("t0"))).as("lat"))
          .unionByName(
            t2.select(lit("2_click_to_purchase").as("transition"),
              col("user_id"),
              (unix_micros(col("t2")) - unix_micros(col("t1")))
                .as("lat")))
        val wOrd = Window.partitionBy(col("transition"))
          .orderBy(col("lat"), col("user_id"))
        val wAll = Window.partitionBy(col("transition"))
        val ranked = lats
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
        def pick(p: Int) = // rank = ceil(p·n/100), integer-exact
          min(when(col("rn") ===
            floor(((col("n") * p + 99).cast("double")) / 100.0)
              .cast("long"), col("lat")))
        ranked.groupBy(col("transition"))
          .agg(max(col("n")).as("n_users"),
            pick(50).as("p50_us"), pick(90).as("p90_us"))
          .select(col("transition"), col("n_users"),
            round(col("p50_us").cast("double") / 1000000.0, 6)
              .as("p50_s"),
            round(col("p90_us").cast("double") / 1000000.0, 6)
              .as("p90_s"))
          .orderBy(col("transition"))
      },
      oracle = Some("""
        WITH su AS (
          SELECT user_id, min(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        t1 AS (
          SELECT s.user_id, s.t0, min(c.ts) AS t1
          FROM su s JOIN events c
            ON c.user_id = s.user_id AND c.event_type = 'click'
           AND c.ts >= s.t0
          GROUP BY 1, 2),
        t2 AS (
          SELECT t1.user_id, t1.t1, min(p.ts) AS t2
          FROM t1 JOIN events p
            ON p.user_id = t1.user_id AND p.event_type = 'purchase'
           AND p.ts >= t1.t1
          GROUP BY 1, 2),
        lats AS (
          SELECT '1_signup_to_click' AS transition, user_id,
                 epoch_us(t1) - epoch_us(t0) AS lat
          FROM t1
          UNION ALL
          SELECT '2_click_to_purchase' AS transition, user_id,
                 epoch_us(t2) - epoch_us(t1) AS lat
          FROM t2),
        ranked AS (
          SELECT transition, lat,
                 CAST(row_number() OVER (PARTITION BY transition
                   ORDER BY lat, user_id) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY transition)
                   AS BIGINT) AS n
          FROM lats)
        SELECT transition, max(n) AS n_users,
               round(CAST(min(CASE WHEN rn = CAST(floor(
                   CAST(n * 50 + 99 AS DOUBLE) / 100.0) AS BIGINT)
                 THEN lat END) AS DOUBLE) / 1000000.0, 6) AS p50_s,
               round(CAST(min(CASE WHEN rn = CAST(floor(
                   CAST(n * 90 + 99 AS DOUBLE) / 100.0) AS BIGINT)
                 THEN lat END) AS DOUBLE) / 1000000.0, 6) AS p90_s
        FROM ranked GROUP BY transition
        ORDER BY transition""")),

    // J17 — INTERPOLATING AS-OF JOIN: for each purchase, the user's
    // 'view' value AT that instant, linearly interpolated between the
    // bracketing view readings (prev ≤ ts, next > ts; ffill/bfill at
    // the edges) — the sensor-fusion join j4's step-function as-of
    // can't express. NO correlated subquery and NO range join: the
    // union trick tags both streams, sorts once per user, and carries
    // prev via last(ignoreNulls) ascending + next via
    // first(ignoreNulls) over the FOLLOWING frame — one user-keyed
    // exchange, one sort, two frame passes (PlanSpec-pinned). The
    // lerp weight is one micros division; the chain runs on identical
    // IEEE operands both engines, rounded once. Same-ts views sort
    // BEFORE the purchase (src tag), so prev claims them and next
    // never does — the boundary is deterministic, not tie-luck.
    "j17_interp_asof" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val tagged = ev.filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "view", 0).otherwise(1).as("src"),
            when(col("event_type") === "view", col("value")).as("vv"))
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("src"), col("event_id"))
        val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
        val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
        val carried = tagged
          .withColumn("p_ts",
            last(when(col("src") === 0, col("ts")), ignoreNulls = true)
              .over(wPrev))
          .withColumn("p_v",
            last(when(col("src") === 0, col("vv")), ignoreNulls = true)
              .over(wPrev))
          .withColumn("n_ts",
            first(when(col("src") === 0, col("ts")), ignoreNulls = true)
              .over(wNext))
          .withColumn("n_v",
            first(when(col("src") === 0, col("vv")), ignoreNulls = true)
              .over(wNext))
        val w = (unix_micros(col("ts")) - unix_micros(col("p_ts")))
          .cast("double") /
          (unix_micros(col("n_ts")) - unix_micros(col("p_ts")))
            .cast("double")
        carried.filter(col("src") === 1)
          .select(col("user_id"), col("event_id"), col("ts"),
            round(
              when(col("p_ts").isNotNull && col("n_ts").isNotNull,
                when(col("n_ts") === col("p_ts"), col("p_v"))
                  .otherwise(col("p_v") +
                    (col("n_v") - col("p_v")) * w))
                .when(col("p_ts").isNotNull, col("p_v"))
                .otherwise(col("n_v")), 6).as("view_value_at"),
            when(col("p_ts").isNotNull && col("n_ts").isNotNull,
              "interp")
              .when(col("p_ts").isNotNull, "ffill")
              .when(col("n_ts").isNotNull, "bfill")
              .otherwise("none").as("method"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some("""
        WITH tagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS src,
                 CASE WHEN event_type = 'view' THEN value END AS vv
          FROM events WHERE event_type IN ('view', 'purchase')),
        carried AS (
          SELECT *,
                 last_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                     ORDER BY ts, src, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS p_ts,
                 last_value(CASE WHEN src = 0 THEN vv END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                     ORDER BY ts, src, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS p_v,
                 first_value(CASE WHEN src = 0 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                     ORDER BY ts, src, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_ts,
                 first_value(CASE WHEN src = 0 THEN vv END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                     ORDER BY ts, src, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_v
          FROM tagged)
        SELECT user_id, event_id, ts,
               round(CASE
                 WHEN p_ts IS NOT NULL AND n_ts IS NOT NULL THEN
                   CASE WHEN n_ts = p_ts THEN p_v
                        ELSE p_v + (n_v - p_v) *
                          (CAST(epoch_us(ts) - epoch_us(p_ts) AS DOUBLE)
                           / CAST(epoch_us(n_ts) - epoch_us(p_ts)
                               AS DOUBLE))
                   END
                 WHEN p_ts IS NOT NULL THEN p_v
                 ELSE n_v END, 6) AS view_value_at,
               CASE WHEN p_ts IS NOT NULL AND n_ts IS NOT NULL
                      THEN 'interp'
                    WHEN p_ts IS NOT NULL THEN 'ffill'
                    WHEN n_ts IS NOT NULL THEN 'bfill'
                    ELSE 'none' END AS method
        FROM carried WHERE src = 1
        ORDER BY user_id, event_id""")),

    // C27 — DAILY DISTRIBUTION-DRIFT TRAJECTORY: KL(day's event-type
    // mix ‖ corpus mix) per day with +1 Laplace smoothing — c5
    // measures drift between two static slices; this emits the curve
    // an ingest monitor actually alarms on (the day a source changed
    // its mix shows as a spike). The full day×type grid is built
    // explicitly (a missing type on a day must contribute its
    // smoothed term, not silently drop); each term's ratio assembles
    // as ONE division from BIGINT products before ln (the c13/c24
    // discipline), terms round-12 and fold as decimals per day.
    // Day-grain frames only; the corpus-scale work is one
    // (day, type) groupBy.
    "c27_daily_drift" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(date_trunc("day", col("ts")).as("day"),
            col("event_type"))
        val daily = ev.groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val days = ev.groupBy(col("day")).agg(count(lit(1)).as("nd"))
        val types = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("ct"))
        val tot = ev.agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("k"))
        val grid = days.crossJoin(broadcast(types))
          .join(daily, Seq("day", "event_type"), "left")
          .crossJoin(broadcast(tot))
          .select(col("day"), col("nd"),
            (coalesce(col("c"), lit(0L)) + 1).as("c1"),
            (col("nd") + col("k")).as("ndk"),
            (col("ct") + 1).as("ct1"),
            (col("n") + col("k")).as("nk"))
        grid
          .select(col("day"), col("nd"),
            round((col("c1").cast("double") / col("ndk").cast("double")) *
              log((col("c1") * col("nk")).cast("double") /
                (col("ndk") * col("ct1")).cast("double")), 12)
              .cast("decimal(24,12)").as("term"))
          .groupBy(col("day"), col("nd"))
          .agg(sum(col("term")).as("s"))
          .select(col("day"), col("nd").as("n_events"),
            round(col("s").cast("double"), 6).as("kl"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 event_type
          FROM events),
        daily AS (
          SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2),
        days AS (
          SELECT day, CAST(count(*) AS BIGINT) AS nd
          FROM ev GROUP BY 1),
        types AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS ct
          FROM ev GROUP BY 1),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS k
          FROM ev),
        grid AS (
          SELECT d.day, d.nd,
                 coalesce(x.c, 0) + 1 AS c1,
                 d.nd + t.k AS ndk,
                 y.ct + 1 AS ct1,
                 t.n + t.k AS nk
          FROM days d
          CROSS JOIN types y
          LEFT JOIN daily x ON x.day = d.day
                           AND x.event_type = y.event_type
          CROSS JOIN tot t),
        terms AS (
          SELECT day, nd,
                 CAST(round((CAST(c1 AS DOUBLE) / CAST(ndk AS DOUBLE))
                   * ln(CAST(c1 * nk AS DOUBLE)
                        / CAST(ndk * ct1 AS DOUBLE)), 12)
                   AS DECIMAL(24,12)) AS term
          FROM grid)
        SELECT day, nd AS n_events,
               round(CAST(sum(term) AS DOUBLE), 6) AS kl
        FROM terms GROUP BY 1, 2 ORDER BY day""")),

    // A54 — SEASONAL-NAIVE FORECAST BACKTEST: forecast each day's
    // event count by the same weekday last week (the baseline every
    // fancier forecaster must beat), scored per event type with MAE
    // and MAPE. The join is on exact epoch arithmetic (day − 7d
    // micros), not lag(7) — a type with missing days must match the
    // CALENDAR week-ago day or not score at all, and the day-grain
    // frame is calendar-sized. Errors stay BIGINT; MAE is one
    // division; MAPE folds round-9 per-day ratios as decimals
    // (order-free) with one final division.
    "a54_seasonal_backtest" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val f = daily.select(col("event_type").as("__t"),
          col("day").as("__d"), col("x").as("fc"))
        daily
          .join(f, col("__t") === col("event_type") &&
            unix_micros(col("__d")) ===
              unix_micros(col("day")) - lit(604800000000L))
          .select(col("event_type"),
            abs(col("x") - col("fc")).as("ae"),
            round(abs(col("x") - col("fc")).cast("double") /
              col("x").cast("double"), 9).cast("decimal(20,9)")
              .as("ape"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days_scored"),
            sum(col("ae")).as("sae"),
            sum(col("ape")).as("sape"))
          .select(col("event_type"), col("n_days_scored"),
            round(col("sae").cast("double") /
              col("n_days_scored").cast("double"), 6).as("mae"),
            round(col("sape").cast("double") /
              col("n_days_scored").cast("double"), 6).as("mape"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        j AS (
          SELECT a.event_type,
                 CAST(abs(a.x - f.x) AS BIGINT) AS ae,
                 CAST(round(CAST(abs(a.x - f.x) AS DOUBLE)
                   / CAST(a.x AS DOUBLE), 9) AS DECIMAL(20,9)) AS ape
          FROM daily a JOIN daily f
            ON f.event_type = a.event_type
           AND epoch_us(f.day) = epoch_us(a.day) - 604800000000)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_scored,
               round(CAST(sum(ae) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mae,
               round(CAST(sum(ape) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mape
        FROM j GROUP BY 1 ORDER BY event_type""")),

    // J16 — INTERVAL-OVERLAP MEASURE: j15 names the Allen relation
    // between each user's click and view spans; this one MEASURES the
    // intersection — overlap micros = max(0, min(ends) − max(starts))
    // per user, aggregated into the corpus summary (pair count,
    // overlapping share, total/mean overlap seconds). The micros stay
    // BIGINT through every sum; the second divisions are one IEEE
    // step each from exact integer operands. Same one-groupBy-
    // per-type + user-keyed join shape as j15 — scan-dominated.
    "j16_interval_overlap" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        def span(tp: String, pre: String) =
          ev.filter(col("event_type") === tp)
            .groupBy(col("user_id"))
            .agg(min(col("ts")).as(pre + "s"), max(col("ts")).as(pre + "e"))
        val ov = span("click", "a").join(span("view", "b"), "user_id")
          .select(greatest(lit(0L),
            least(unix_micros(col("ae")), unix_micros(col("be"))) -
              greatest(unix_micros(col("as")), unix_micros(col("bs"))))
            .as("ov_us"))
        ov.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("ov_us") > 0, 1L).otherwise(0L))
              .as("n_overlapping"),
            sum(col("ov_us")).as("tot_us"))
          .select(col("n_pairs"), col("n_overlapping"),
            round(col("n_overlapping").cast("double") /
              col("n_pairs").cast("double"), 6).as("overlap_share"),
            round(col("tot_us").cast("double") / lit(1000000.0), 6)
              .as("total_overlap_s"),
            round(col("tot_us").cast("double") /
              (col("n_overlapping").cast("double") * lit(1000000.0)), 6)
              .as("mean_overlap_s"))
      },
      oracle = Some("""
        WITH a AS (
          SELECT user_id, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
          FROM events WHERE event_type = 'click' GROUP BY 1),
        b AS (
          SELECT user_id, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
          FROM events WHERE event_type = 'view' GROUP BY 1),
        ov AS (
          SELECT greatest(0, least(a.e, b.e) - greatest(a.s, b.s))
                   AS ov_us
          FROM a JOIN b USING (user_id)),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CASE WHEN ov_us > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_overlapping,
                 CAST(sum(ov_us) AS BIGINT) AS tot_us
          FROM ov)
        SELECT n_pairs, n_overlapping,
               round(CAST(n_overlapping AS DOUBLE)
                 / CAST(n_pairs AS DOUBLE), 6) AS overlap_share,
               round(CAST(tot_us AS DOUBLE) / 1000000.0, 6)
                 AS total_overlap_s,
               round(CAST(tot_us AS DOUBLE)
                 / (CAST(n_overlapping AS DOUBLE) * 1000000.0), 6)
                 AS mean_overlap_s
        FROM agg""")),

    // A53 — LAST-TOUCH REVENUE ATTRIBUTION: each purchase's value is
    // credited to the user's most recent preceding touch (click or
    // view) within a 7-day lookback, else to 'direct' — the
    // marketing-analytics join every event warehouse runs nightly.
    // ONE pass, no self-join: last(touch, ignoreNulls) over the
    // per-user (ts, event_id) window carries the latest touch type
    // and timestamp onto every purchase row (the same carry-forward
    // shape as a6's ffill), so the "find the preceding event" lookup
    // that is a correlated subquery in row stores is a single
    // user-keyed exchange here. Revenue folds as decimal(18,6)
    // (order-free), one cast-and-round at the end.
    "a53_attribution" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val touch = col("event_type").isin("click", "view")
        val ev = t(s, dir, "events")
          .filter(col("event_type").isin("click", "view", "purchase"))
          .withColumn("lt_type",
            last(when(touch, col("event_type")), ignoreNulls = true)
              .over(w))
          .withColumn("lt_ts",
            last(when(touch, col("ts")), ignoreNulls = true).over(w))
        ev.filter(col("event_type") === "purchase")
          .select(
            when(col("lt_ts").isNotNull &&
              unix_micros(col("ts")) - unix_micros(col("lt_ts")) <=
                lit(604800000000L), col("lt_type"))
              .otherwise(lit("direct")).as("channel"),
            col("value"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,6)")).as("rev"))
          .select(col("channel"), col("n_purchases"),
            round(col("rev").cast("double"), 6).as("revenue"))
          .orderBy(col("channel"))
      },
      bench = true,
      oracle = Some("""
        WITH ev AS (
          SELECT *,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                            THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lt_type,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                            THEN ts END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lt_ts
          FROM events
          WHERE event_type IN ('click', 'view', 'purchase')),
        p AS (
          SELECT CASE WHEN lt_ts IS NOT NULL
                       AND epoch_us(ts) - epoch_us(lt_ts) <= 604800000000
                      THEN lt_type ELSE 'direct' END AS channel,
                 value
          FROM ev WHERE event_type = 'purchase')
        SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                 AS revenue
        FROM p GROUP BY 1 ORDER BY channel""")),

    // A43 — HyperLogLog distinct users per event_type (m = 64
    // registers over the deterministic 60-bit md5 hash), INCLUDING the
    // merge algebra: per-half builds (even/odd event_id) fold by
    // register-wise max into exactly the full build, so merged_est must
    // equal n_distinct_est. KMV (a13) retains k hashes; HLL retains m
    // 6-bit ranks — ~8× smaller at equal error, the layout production
    // cardinality rollups use. The registers are restated verbatim in
    // SQL (bucket = hv div 2^54, rho = 55 − msb position via bin());
    // the estimator sum is assembled as the INTEGER Σ 2^(55−reg) so no
    // float-summation order can split the engines, with one double
    // division at the end (one-division discipline).
    "a43_hll_distinct" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val keys = Seq("event_type")
        val full = graft.operators.SketchOps.hllSketch(ev, keys, "user_id")
        val merged = graft.operators.SketchOps.hllMerge(
          graft.operators.SketchOps.hllSketch(
            ev.filter(col("event_id") % 2 === 0), keys, "user_id")
            .union(graft.operators.SketchOps.hllSketch(
              ev.filter(col("event_id") % 2 === 1), keys, "user_id")),
          keys)
        val est = graft.operators.SketchOps.hllEstimate(full, keys)
        val mest = graft.operators.SketchOps.hllEstimate(merged, keys)
          .select(col("event_type"), col("n_distinct_est").as("merged_est"))
        val exact = ev.groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("exact_distinct"))
        est.join(mest, "event_type").join(exact, "event_type")
          .select(col("event_type"), col("n_zero_regs"),
            col("n_distinct_est"), col("merged_est"), col("exact_distinct"))
          .orderBy(col("event_type"))
      },
      bench = true,
      oracle = Some(s"""
        WITH h AS (
          SELECT DISTINCT event_type,
            list_transform([CAST(user_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] AS hv
          FROM events),
        b AS (
          SELECT event_type,
                 CAST(hv // 18014398509481984 AS INT) AS bucket,
                 hv % 18014398509481984 AS rem
          FROM h),
        r AS (
          SELECT event_type, bucket,
                 max(CASE WHEN rem = 0 THEN 55
                          ELSE 55 - length(bin(rem)) END) AS reg
          FROM b GROUP BY 1, 2),
        g AS (SELECT DISTINCT event_type FROM events),
        f AS (
          SELECT g.event_type, t.b AS bucket, coalesce(r.reg, 0) AS reg
          FROM g CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) t
          LEFT JOIN r ON r.event_type = g.event_type AND r.bucket = t.b),
        s AS (
          SELECT event_type,
                 CAST(sum(CAST(1 AS BIGINT) << (55 - reg)) AS BIGINT)
                   AS s_int,
                 CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS INT)
                   AS zeros
          FROM f GROUP BY 1),
        e AS (
          SELECT event_type, zeros AS n_zero_regs,
            CASE WHEN CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
                        / s_int <= CAST(160 AS DOUBLE)
                   AND zeros > 0
              THEN round(64 * ln(64 / CAST(zeros AS DOUBLE)), 4)
              ELSE round(CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
                           / s_int, 4)
            END AS n_distinct_est
          FROM s),
        x AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY 1)
        SELECT e.event_type, e.n_zero_regs, e.n_distinct_est,
               e.n_distinct_est AS merged_est, x.exact_distinct
        FROM e JOIN x USING (event_type)
        ORDER BY e.event_type""")),

    // A44 — θ-sketch set algebra on KMV sketches (k = 32): per
    // event_type, the user sets seen on even vs odd event_ids are
    // sketched independently, and union / Jaccard / intersection are
    // estimated from the two 32-hash summaries alone — the overlap
    // question ("how many users did both crawls re-collect") that
    // kmvMerge's union-only algebra cannot answer. Estimator (Beyer et
    // al. SIGMOD'07): re-cut the union to k, θ = k-th hash; members of
    // the cut present in BOTH sketches are a uniform sample of the
    // intersection. Exact values ride along for the error audit.
    "a44_kmv_algebra" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val keys = Seq("event_type")
        val ska = graft.operators.SketchOps.kmvSketch(
          ev.filter(col("event_id") % 2 === 0), keys, "user_id", k = 32)
        val skb = graft.operators.SketchOps.kmvSketch(
          ev.filter(col("event_id") % 2 === 1), keys, "user_id", k = 32)
        val alg = graft.operators.SketchOps.kmvAlgebra(
          ska, skb, keys, k = 32)
        val ua = ev.filter(col("event_id") % 2 === 0)
          .select(col("event_type"), col("user_id")).distinct()
        val ub = ev.filter(col("event_id") % 2 === 1)
          .select(col("event_type"), col("user_id")).distinct()
        val exact = ua.union(ub).distinct()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("exact_union"))
          .join(ua.intersect(ub)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("exact_intersect")), "event_type")
        alg.join(exact, "event_type")
          .select(col("event_type"), col("n_union_retained"),
            col("union_est"), col("jaccard_est"), col("intersect_est"),
            col("exact_union"), col("exact_intersect"))
          .orderBy(col("event_type"))
      },
      bench = true,
      oracle = Some(s"""
        WITH ha AS (
          SELECT DISTINCT event_type,
            list_transform([CAST(user_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] AS hv
          FROM events WHERE event_id % 2 = 0),
        ra AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rn
          FROM ha),
        ska AS (
          SELECT event_type, list_sort(list(hv)) AS ka
          FROM ra WHERE rn <= 32 GROUP BY 1),
        hb AS (
          SELECT DISTINCT event_type,
            list_transform([CAST(user_id AS VARCHAR)],
              s -> ${TextQueries.baseHashSql})[1] AS hv
          FROM events WHERE event_id % 2 = 1),
        rb AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rn
          FROM hb),
        skb AS (
          SELECT event_type, list_sort(list(hv)) AS kb
          FROM rb WHERE rn <= 32 GROUP BY 1),
        alg0 AS (
          SELECT a.event_type, a.ka, b.kb,
                 list_sort(list_distinct(list_concat(a.ka, b.kb))) AS u
          FROM ska a JOIN skb b USING (event_type)),
        alg1 AS (
          SELECT event_type, ka, kb, u, u[1:32] AS cut,
                 CASE WHEN len(u) < 32 THEN CAST(len(u) AS DOUBLE)
                      ELSE CAST(31 AS DOUBLE) * pow(2, 60) /
                           CAST(u[32] AS DOUBLE) END AS uest
          FROM alg0),
        alg2 AS (
          SELECT event_type, CAST(len(cut) AS INT) AS n_union_retained,
                 uest,
                 CAST(len(list_filter(cut, h ->
                   list_contains(ka, h) AND list_contains(kb, h)))
                   AS DOUBLE) / CAST(len(cut) AS DOUBLE) AS jac
          FROM alg1),
        ua AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE event_id % 2 = 0),
        ub AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE event_id % 2 = 1),
        xu AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS exact_union
          FROM (SELECT DISTINCT event_type, user_id FROM
                 (SELECT * FROM ua UNION ALL SELECT * FROM ub))
          GROUP BY 1),
        xi AS (
          SELECT ua.event_type, CAST(count(*) AS BIGINT) AS exact_intersect
          FROM ua JOIN ub ON ua.event_type = ub.event_type
                         AND ua.user_id = ub.user_id
          GROUP BY 1)
        SELECT a.event_type, a.n_union_retained,
               round(a.uest, 4) AS union_est,
               round(a.jac, 6) AS jaccard_est,
               round(a.jac * a.uest, 4) AS intersect_est,
               xu.exact_union, xi.exact_intersect
        FROM alg2 a
        JOIN xu USING (event_type)
        JOIN xi USING (event_type)
        ORDER BY a.event_type""")),

    // A16 — interval-union coverage: each event opens a [ts, ts +
    // 100·value sec] observation window; merge overlapping-or-touching
    // windows per user into coverage spans (gap-sessionize's sibling —
    // extents by overlap, not points by gap). The merge criterion is
    // start > running MAX of all prior ends (an interval can swallow
    // its successors), which both engines restate identically.
    "a16_interval_union" -> Q(
      fn = (s, dir) => {
        val iv = t(s, dir, "events").select(
          col("user_id"),
          col("ts").as("iv_start"),
          timestamp_micros(unix_micros(col("ts")) +
            round(col("value") * 100).cast("long") * 1000000L)
            .as("iv_end"))
        TimeSeriesOps.mergeIntervals(
          iv, Seq("user_id"), "iv_start", "iv_end")
          .select(col("user_id"), col("span_start"), col("span_end"),
            col("n_intervals"))
          .orderBy(col("user_id"), col("span_start"))
      },
      oracle = Some("""
        WITH iv AS (
          SELECT user_id, ts AS iv_start,
                 ts + to_microseconds(
                   CAST(round(value * 100) AS BIGINT) * 1000000)
                   AS iv_end
          FROM events),
        m AS (
          SELECT user_id, iv_start, iv_end,
                 max(iv_end) OVER (PARTITION BY user_id
                   ORDER BY iv_start, iv_end
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_end
          FROM iv),
        g AS (
          SELECT *, CASE WHEN max_end IS NULL OR iv_start > max_end
                         THEN 1 ELSE 0 END AS boundary
          FROM m),
        sp AS (
          SELECT *, sum(boundary) OVER (PARTITION BY user_id
                   ORDER BY iv_start, iv_end
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_no
          FROM g)
        SELECT user_id, min(iv_start) AS span_start,
               max(iv_end) AS span_end, count(*) AS n_intervals
        FROM sp GROUP BY user_id, span_no
        ORDER BY user_id, span_start""")),

    // A23 — interval GAPS: the uncovered windows between a16's merged
    // coverage spans per user (outage reporting — the union's
    // complement, bounded by each key's first and last coverage). Same
    // interval synthesis as a16; one lag over the span frame; gap width
    // exact in integer microseconds.
    "a23_interval_gaps" -> Q(
      fn = (s, dir) => {
        val iv = t(s, dir, "events").select(
          col("user_id"),
          col("ts").as("iv_start"),
          timestamp_micros(unix_micros(col("ts")) +
            round(col("value") * 100).cast("long") * 1000000L)
            .as("iv_end"))
        TimeSeriesOps.intervalGaps(
          iv, Seq("user_id"), "iv_start", "iv_end")
          .orderBy(col("user_id"), col("gap_start"))
      },
      oracle = Some("""
        WITH iv AS (
          SELECT user_id, ts AS iv_start,
                 ts + to_microseconds(
                   CAST(round(value * 100) AS BIGINT) * 1000000)
                   AS iv_end
          FROM events),
        m AS (
          SELECT user_id, iv_start, iv_end,
                 max(iv_end) OVER (PARTITION BY user_id
                   ORDER BY iv_start, iv_end
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_end
          FROM iv),
        g AS (
          SELECT *, CASE WHEN max_end IS NULL OR iv_start > max_end
                         THEN 1 ELSE 0 END AS boundary
          FROM m),
        sp AS (
          SELECT *, sum(boundary) OVER (PARTITION BY user_id
                   ORDER BY iv_start, iv_end
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_no
          FROM g),
        spans AS (
          SELECT user_id, min(iv_start) AS span_start,
                 max(iv_end) AS span_end
          FROM sp GROUP BY user_id, span_no),
        lagged AS (
          SELECT user_id,
                 lag(span_end) OVER (PARTITION BY user_id
                   ORDER BY span_start) AS gap_start,
                 span_start AS gap_end
          FROM spans)
        SELECT user_id, gap_start, gap_end,
               CAST(epoch_us(gap_end) - epoch_us(gap_start) AS BIGINT)
                 AS gap_micros
        FROM lagged
        WHERE gap_start IS NOT NULL
        ORDER BY user_id, gap_start""")),

    // A28 — event transition matrix (first-order Markov over each
    // user's event stream): count and probability of every observed
    // (event_type → next event_type) transition — the path-analysis /
    // next-event-model input. ONE shuffle on user_id feeds the lead
    // window; the (from, to) aggregation then collapses to a
    // type-pair-sized frame and the per-from totals re-agg that.
    // Tied timestamps pair by (ts, event_id) on both engines — a26's
    // tie-break discipline.
    "a28_transition_matrix" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = t(s, dir, "events")
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .where(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = trans.groupBy(col("from_type"))
          .agg(sum(col("n")).as("total"))
        trans.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n").cast("double") / col("total").cast("double"), 6)
              .as("prob"))
          .orderBy(col("from_type"), col("to_type"))
      },
      oracle = Some("""
        WITH tr AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_type
          FROM events),
        c AS (
          SELECT from_type, to_type, count(*) AS n
          FROM tr WHERE to_type IS NOT NULL
          GROUP BY 1, 2),
        tot AS (
          SELECT from_type, CAST(sum(n) AS BIGINT) AS total
          FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
               round(CAST(c.n AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
                 AS prob
        FROM c JOIN tot ON tot.from_type = c.from_type
        ORDER BY c.from_type, c.to_type""")),

    // A26 — trapezoidal time-weighted average per event type (the TSDB
    // integral/span aggregate): duration-weights each sample so burst
    // periods stop dominating the mean — shown next to the plain
    // decimal-summed mean for contrast. Pairing is order-sensitive at
    // tied timestamps, so both engines order (ts, event_id); trapezoid
    // terms round 9 dp and sum as decimals, the denominator telescopes
    // to exact integer micros. One shuffle: lead window and final agg
    // share the event_type partitioning.
    "a26_time_weighted_avg" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps.timeWeightedAvg(
          t(s, dir, "events"), Seq("event_type"), "ts", "value",
          tieCol = "event_id")
          .orderBy(col("event_type")),
      oracle = Some("""
        WITH o AS (
          SELECT event_type, value, epoch_us(ts) AS tu,
                 lead(value) OVER (PARTITION BY event_type
                   ORDER BY ts, event_id) AS v2,
                 lead(epoch_us(ts)) OVER (PARTITION BY event_type
                   ORDER BY ts, event_id) AS tu2
          FROM events),
        t AS (
          SELECT event_type,
                 CAST(round((value + v2) * 0.5 *
                      (CAST(tu2 - tu AS DOUBLE) / 1000000.0), 9)
                   AS DECIMAL(28,9)) AS term
          FROM o WHERE v2 IS NOT NULL),
        b AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
                 round(CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9)))
                       AS DOUBLE) / count(*), 6) AS mean_v,
                 min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
          FROM events GROUP BY 1),
        s AS (SELECT event_type, sum(term) AS num FROM t GROUP BY 1)
        SELECT b.event_type, b.n_points, b.mean_v,
               CASE WHEN b.mx > b.mn THEN
                 round(CAST(s.num AS DOUBLE) /
                   (CAST(b.mx - b.mn AS DOUBLE) / 1000000.0), 6)
               END AS twa
        FROM b LEFT JOIN s ON s.event_type = b.event_type
        ORDER BY b.event_type""")),

    // A24 — growth accounting: per day, event volume, active users, NEW
    // users (first-ever event lands that day) and the cumulative user
    // count — the DAU/retention denominator every analytics stack
    // derives. First-seen attribution is one per-user min (partial-
    // aggregable, no window over the event stream); the running total
    // is a window over the DAY frame — calendar-sized, not data-sized.
    "a24_user_growth" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val firstSeen = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("first_day"))
        val daily = ev.groupBy(col("day"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_active"))
        val newUsers = firstSeen.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("n_new"))
        daily.join(newUsers, Seq("day"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("cum_users",
            sum(col("n_new")).over(
              Window.orderBy(col("day"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        fs AS (
          SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id),
        daily AS (
          SELECT day, count(*) AS n_events,
                 count(DISTINCT user_id) AS n_active
          FROM ev GROUP BY day),
        nu AS (
          SELECT first_day AS day, count(*) AS n_new
          FROM fs GROUP BY first_day)
        SELECT d.day, d.n_events, d.n_active,
               coalesce(nu.n_new, 0) AS n_new,
               CAST(sum(coalesce(nu.n_new, 0)) OVER (ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM daily d LEFT JOIN nu ON nu.day = d.day
        ORDER BY d.day""")),

    // A32 — gaps-and-islands run-length encoding: per user, collapse
    // consecutive same-event_type rows (ts order, event_id ties) into one
    // row per run with a sequential run_id and the run's span. The classic
    // sessionless pattern detector (retry storms, sensor stuck-at faults);
    // one hash exchange on user_id feeds the boundary window, the running
    // sum, and the run aggregation (TimeSeriesOps.islands scaladoc).
    "a32_event_runs" -> Q(
      fn = (s, dir) => {
        TimeSeriesOps.islands(
          t(s, dir, "events")
            .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type")),
          Seq("user_id"), "ts", "event_id", "event_type")
          .select(col("user_id"), col("run_id"), col("event_type"),
            col("run_len"), col("run_start"), col("run_end"))
          .orderBy(col("user_id"), col("run_id"))
      },
      bench = true,
      oracle = Some("""
        WITH x AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER w AS rn,
                 lag(event_type) OVER w AS prev
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (
          SELECT *, CAST(sum(CASE WHEN rn = 1
                     OR prev IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS run_id
          FROM x)
        SELECT user_id, run_id, event_type,
               CAST(count(*) AS BIGINT) AS run_len,
               min(ts) AS run_start, max(ts) AS run_end
        FROM r GROUP BY 1, 2, 3
        ORDER BY user_id, run_id""")),

    // A33 — CUSUM drift detection on daily event volume per type: the
    // running sum of (daily count - per-type mean daily count), the
    // standard change-point excursion statistic. Computed EXACTLY in
    // scaled integers — cusum_scaled = Σ(n·days - total) — so the only
    // float is the final normalized readout; by construction the last
    // row of every series returns to exactly 0. Per-type daily grids are
    // calendar-bounded (the a24 argument), so the per-type window never
    // exceeds ~37k rows even at 100 years.
    "a33_cusum_drift" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val tot = d.groupBy(col("event_type"))
          .agg(count(lit(1)).as("days"), sum(col("n")).as("total"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.join(broadcast(tot), "event_type")
          .withColumn("cusum_scaled",
            sum(col("n") * col("days") - col("total")).over(w))
          .withColumn("cusum",
            round(col("cusum_scaled").cast("double") / col("days"), 6))
          .select(col("event_type"), col("day"), col("n"),
            col("cusum_scaled"), col("cusum"))
          .orderBy(col("event_type"), col("day"))
      },
      bench = true,
      oracle = Some("""
        WITH d AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS days,
                 CAST(sum(n) AS BIGINT) AS total
          FROM d GROUP BY 1),
        c AS (
          SELECT d.event_type, d.day, d.n, t.days,
                 CAST(sum(d.n * t.days - t.total) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cusum_scaled
          FROM d JOIN t USING (event_type))
        SELECT event_type, day, n, cusum_scaled,
               round(CAST(cusum_scaled AS DOUBLE) / days, 6) AS cusum
        FROM c
        ORDER BY event_type, day""")),

    // A34 — hourly OHLC downsampling bars per event_type: open/close by
    // (ts, event_id) order, high/low as plain extremes — the canonical
    // lossy time-series compaction (a6 resamples onto a grid and
    // carries values; OHLC summarizes the within-bucket trajectory).
    // open/close/high/low are RAW stored doubles — no arithmetic, so no
    // rounding is needed for cross-engine agreement. Both row_number
    // windows and the bar aggregation share the (event_type, hour) hash
    // partitioning — HashPartitioning satisfies the superset clustering,
    // the a32 argument — so the whole query is one exchange.
    "a34_ohlc_bars" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"),
            date_trunc("hour", col("ts")).as("hour"),
            col("ts"), col("event_id"), col("value"))
        val wAsc = Window.partitionBy(col("event_type"), col("hour"))
          .orderBy(col("ts"), col("event_id"))
        val wDesc = Window.partitionBy(col("event_type"), col("hour"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rna", row_number().over(wAsc))
          .withColumn("rnd", row_number().over(wDesc))
          .groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("n"),
            max(when(col("rna") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rnd") === 1, col("value"))).as("close"))
          .orderBy(col("event_type"), col("hour"))
      },
      bench = true,
      oracle = Some("""
        WITH e AS (
          SELECT event_type, date_trunc('hour', ts) AS hour, value,
                 row_number() OVER (PARTITION BY event_type,
                   date_trunc('hour', ts) ORDER BY ts, event_id) AS rna,
                 row_number() OVER (PARTITION BY event_type,
                   date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rnd
          FROM events)
        SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n,
               max(CASE WHEN rna = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rnd = 1 THEN value END) AS close
        FROM e GROUP BY 1, 2
        ORDER BY event_type, hour""")),

    // A35 — day-of-week seasonal residuals on daily volume: the a33
    // CUSUM detects LEVEL drift; this subtracts the weekly seasonal
    // baseline first, the difference between "weekends are always
    // quiet" and "this Saturday was anomalous". Same exact-integer
    // discipline: resid_scaled = n·days_dow − total_dow is pure BIGINT
    // and sums to zero within every (type, dow) cell by construction;
    // the normalized readout is the only float. Day-of-week alignment:
    // Spark dayofweek() is 1=Sunday..7, DuckDB dow() is 0..6 — the
    // Spark side subtracts 1 to meet DuckDB's convention.
    "a35_seasonal_residual" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .withColumn("dow", (dayofweek(col("day")) - 1).cast("bigint"))
        val base = d.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("days_dow"), sum(col("n")).as("tot_dow"))
        d.join(broadcast(base), Seq("event_type", "dow"))
          .withColumn("resid_scaled",
            col("n") * col("days_dow") - col("tot_dow"))
          .withColumn("resid",
            round(col("resid_scaled").cast("double") / col("days_dow"), 6))
          .select(col("event_type"), col("day"), col("dow"), col("n"),
            col("resid_scaled"), col("resid"))
          .orderBy(col("event_type"), col("day"))
      },
      bench = true,
      oracle = Some("""
        WITH d AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        dd AS (
          SELECT *, CAST(dayofweek(day) AS BIGINT) AS dow FROM d),
        base AS (
          SELECT event_type, dow, CAST(count(*) AS BIGINT) AS days_dow,
                 CAST(sum(n) AS BIGINT) AS tot_dow
          FROM dd GROUP BY 1, 2)
        SELECT dd.event_type, dd.day, dd.dow, dd.n,
               dd.n * base.days_dow - base.tot_dow AS resid_scaled,
               round(CAST(dd.n * base.days_dow - base.tot_dow AS DOUBLE)
                 / base.days_dow, 6) AS resid
        FROM dd JOIN base USING (event_type, dow)
        ORDER BY dd.event_type, dd.day""")),

    // A37 — EXACT trailing-7-day distinct users (DAU/WAU + stickiness):
    // each (day, user) distinct pair contributes to its next seven
    // target days, so the rolling distinct is one 7× expansion of the
    // DISTINCT-PAIR frame (bounded by 7·|daily actives|, never 7× the
    // raw stream) + one count-distinct — the exact-sliding-distinct
    // idiom that replaces a quadratic self-join. Targets restrict to
    // observed days via the spine join.
    "a37_rolling_distinct" -> Q(
      fn = (s, dir) => {
        val du = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val spine = du.select(col("day")).distinct()
        val dau = du.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val roll = du
          .withColumn("off", explode(sequence(lit(0), lit(6))))
          .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
          .join(spine, Seq("day"))
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        dau.join(roll, Seq("day"))
          .withColumn("stickiness",
            round(col("dau").cast("double") / col("wau"), 6))
          .orderBy(col("day"))
      },
      bench = true,
      oracle = Some("""
        WITH du AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        spine AS (SELECT DISTINCT day FROM du),
        dau AS (
          SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          FROM du GROUP BY 1),
        roll AS (
          SELECT s.day, CAST(count(DISTINCT x.user_id) AS BIGINT) AS wau
          FROM (SELECT d.user_id, d.day + o.off AS tday
                FROM du d CROSS JOIN (SELECT CAST(range AS INT) AS off
                                      FROM range(0, 7)) o) x
          JOIN spine s ON s.day = x.tday
          GROUP BY 1)
        SELECT d.day, d.dau, r.wau,
               round(CAST(d.dau AS DOUBLE) / r.wau, 6) AS stickiness
        FROM dau d JOIN roll r USING (day)
        ORDER BY day""")),

    // A38 — value-window kit, a11's navigation sibling completing the
    // §2.5 window surface: first/last over the full frame, running
    // last-non-null with IGNORE NULLS (the forward-fill primitive a6
    // builds from), nth_value, and defaulted lag/lead. One
    // user-partitioned sort serves all six functions; values are raw
    // stored doubles (no arithmetic, no rounding needed).
    "a38_value_window_kit" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wFull = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val wCur = w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .withColumn("big", when(col("value") > 50, col("value")))
          .select(col("event_id"), col("user_id"), col("value"),
            first(col("value")).over(wFull).as("first_v"),
            last(col("value")).over(wFull).as("last_v"),
            last(col("big"), ignoreNulls = true).over(wCur)
              .as("last_big"),
            nth_value(col("value"), 2).over(wFull).as("second_v"),
            lag(col("value"), 1, -1.0).over(w).as("prev_v"),
            lead(col("value"), 1, -1.0).over(w).as("next_v"))
          .orderBy(col("event_id"))
      },
      bench = true,
      oracle = Some("""
        SELECT event_id, user_id, value,
               first_value(value) OVER wf AS first_v,
               last_value(value) OVER wf AS last_v,
               last_value(CASE WHEN value > 50 THEN value END
                 IGNORE NULLS) OVER wc AS last_big,
               nth_value(value, 2) OVER wf AS second_v,
               lag(value, 1, -1.0) OVER w AS prev_v,
               lead(value, 1, -1.0) OVER w AS next_v
        FROM events WHERE event_type = 'purchase'
        WINDOW
          w AS (PARTITION BY user_id ORDER BY ts, event_id),
          wc AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
        ORDER BY event_id""")),

    // A39 — weighted median per group: smallest value whose cumulative
    // weight reaches half the group total — the robust center when rows
    // carry unequal mass (dedup multiplicities, sampling weights,
    // token counts). The threshold compare is 2·cw ≥ tw in pure BIGINT
    // (no halves, no floats anywhere until the output value itself,
    // which is a raw stored double); one keyed window + one rank pick,
    // the same single-exchange shape as every keyed analytic here.
    // Weights derive deterministically from row identity (event_id%5+1)
    // so the oracle reproduces them exactly.
    "a39_weighted_median" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("wt", (col("event_id") % 5 + 1).cast("long"))
        val wCum = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = ev.groupBy(col("event_type"))
          .agg(sum(col("wt")).as("tw"))
        val wPick = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        ev.withColumn("cw", sum(col("wt")).over(wCum))
          .join(broadcast(tot), Seq("event_type"))
          .filter(col("cw") * 2 >= col("tw"))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("value").as("weighted_median"),
            col("tw"))
          .orderBy(col("event_type"))
      },
      bench = true,
      oracle = Some("""
        WITH e AS (
          SELECT event_type, event_id, value,
                 CAST(event_id % 5 + 1 AS BIGINT) AS wt
          FROM events),
        c AS (
          SELECT event_type, event_id, value, wt,
                 CAST(sum(wt) OVER (PARTITION BY event_type
                   ORDER BY value, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw
          FROM e),
        t AS (SELECT event_type, CAST(sum(wt) AS BIGINT) AS tw
              FROM e GROUP BY 1),
        f AS (
          SELECT c.event_type, c.value, t.tw,
                 row_number() OVER (PARTITION BY c.event_type
                   ORDER BY c.value, c.event_id) AS rn
          FROM c JOIN t USING (event_type)
          WHERE c.cw * 2 >= t.tw)
        SELECT event_type, value AS weighted_median, tw
        FROM f WHERE rn = 1
        ORDER BY event_type""")),

    // A40 — Gini concentration of activity per event type: how unequal
    // the per-user event distribution is (0 = uniform, →1 = one user
    // dominates) — the whale-detection diagnostic behind rate limits
    // and skew planning (a18 profiles keys; this is the scalar
    // inequality readout). Exact integer assembly: with per-user
    // counts x ranked ascending, G = (2·Σr·x − (n+1)·Σx) / (n·Σx) —
    // numerator and denominator both BIGINT, ONE double division.
    "a40_gini_activity" -> Q(
      fn = (s, dir) => {
        val cnt = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("x"), col("user_id"))
        cnt.withColumn("r", row_number().over(w).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("x")).as("s0"),
            sum(col("r") * col("x")).as("s1"))
          .withColumn("gini",
            round((lit(2) * col("s1") - (col("n_users") + 1) * col("s0"))
              .cast("double") /
              (col("n_users") * col("s0")).cast("double"), 6))
          .select(col("event_type"), col("n_users"), col("s0"),
            col("gini"))
          .orderBy(col("event_type"))
      },
      bench = true,
      oracle = Some("""
        WITH c AS (
          SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, x,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY x, user_id) AS BIGINT) AS r
          FROM c),
        g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS s0,
                 CAST(sum(r * x) AS BIGINT) AS s1
          FROM r GROUP BY 1)
        SELECT event_type, n_users, s0,
               round(CAST(2 * s1 - (n_users + 1) * s0 AS DOUBLE) /
                 CAST(n_users * s0 AS DOUBLE), 6) AS gini
        FROM g
        ORDER BY event_type""")),

    // A41 — period-over-period change: weekly volumes per type with the
    // previous week's count and the growth ratio — the standard BI
    // trend readout (a24 tracks cumulative growth; this is the
    // derivative view). Weeks truncate via date_trunc('week') —
    // Monday-start on both engines; the ratio is the only float.
    "a41_wow_change" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("week"))
        t(s, dir, "events")
          .groupBy(col("event_type"),
            date_trunc("week", col("ts")).as("week"))
          .agg(count(lit(1)).as("n"))
          .withColumn("prev_n", lag(col("n"), 1).over(w))
          .withColumn("wow",
            round(col("n").cast("double") / col("prev_n"), 6))
          .orderBy(col("event_type"), col("week"))
      },
      bench = true,
      oracle = Some("""
        WITH wk AS (
          SELECT event_type,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type, week, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY week)
                 AS prev_n,
               round(CAST(n AS DOUBLE) /
                 lag(n) OVER (PARTITION BY event_type ORDER BY week), 6)
                 AS wow
        FROM wk
        ORDER BY event_type, week""")),

    // A30 — exponentially weighted moving average (pandas ewm adjust=True,
    // alpha=0.3, truncated at 10 lags): each user's final smoothed value
    // = Σ v_j·0.7^lag / Σ 0.7^lag over the last 10 events. The 10-lag
    // truncation is what makes it a WINDOW op (rows 9 preceding), not a
    // whole-history recursion — state is O(10) per user at any scale, and
    // the collect_list frame order is the window's total order (ts, then
    // event_id on ties). Weights round to 9 dp before the multiply:
    // 0.7^k is EXACT at k decimal digits, so a last-ulp pow() divergence
    // between engines rounds away; the term fold is the established
    // left-fold == list_reduce equivalence.
    "a30_ewma" -> Q(
      fn = (s, dir) => {
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val arr = collect_list(col("value"))
          .over(ord.rowsBetween(-9, Window.currentRow))
        val last = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val n = size(col("arr"))
        val term = (j: Column) =>
          element_at(col("arr"), j) *
            round(pow(lit(0.7), (n - j).cast("double")), 9)
        val wgt = (j: Column) =>
          round(pow(lit(0.7), (n - j).cast("double")), 9)
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("arr", arr)
          .withColumn("n_events",
            count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .withColumn("rn", row_number().over(last))
          .filter(col("rn") === 1)
          .withColumn("ewma", round(
            aggregate(sequence(lit(1), n), lit(0.0),
              (acc, j) => acc + term(j)) /
              aggregate(sequence(lit(1), n), lit(0.0),
                (acc, j) => acc + wgt(j)), 6))
          .select(col("user_id"), col("n_events"), col("ewma"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id,
                 list(value) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS arr,
                 count(*) OVER (PARTITION BY user_id) AS n_events,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, n_events,
               round(
                 list_reduce(list_transform(generate_series(1, len(arr)),
                   j -> arr[j] * round(pow(0.7,
                     CAST(len(arr) - j AS DOUBLE)), 9)),
                   (x, y) -> x + y)
                 /
                 list_reduce(list_transform(generate_series(1, len(arr)),
                   j -> round(pow(0.7,
                     CAST(len(arr) - j AS DOUBLE)), 9)),
                   (x, y) -> x + y), 6) AS ewma
        FROM ev WHERE rn = 1
        ORDER BY user_id""")),

    // A31 — MAD robust outliers: per event_type, flag values more than
    // 3·1.4826·MAD from the median (the z-score's heavy-tail-safe
    // sibling — median and MAD don't move when the outliers themselves
    // do). Two exact-percentile aggregations + two broadcast joins of a
    // 5-row frame; at scale the exact percentile swaps for
    // approx_percentile without touching the shape. Median and MAD round
    // to 9 dp before the threshold compare so a last-ulp interpolation
    // difference between engines can't flip a flag.
    "a31_mad_outliers" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(round(percentile(col("value"), lit(0.5)), 9).as("med9"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("absdev", abs(col("value") - col("med9")))
        val mad = dev.groupBy(col("event_type"))
          .agg(round(percentile(col("absdev"), lit(0.5)), 9).as("mad9"))
        dev.join(broadcast(mad), "event_type")
          .withColumn("is_out",
            col("absdev") > round(lit(3) * lit(1.4826) * col("mad9"), 9))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(first(col("med9")), 6).as("med"),
            round(first(col("mad9")), 6).as("mad"),
            count(when(col("is_out"), 1)).as("n_outliers"))
          .withColumn("outlier_pct",
            round(col("n_outliers").cast("double") / col("n"), 6))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH med AS (
          SELECT event_type, round(quantile_cont(value, 0.5), 9) AS med9
          FROM events GROUP BY event_type),
        dev AS (
          SELECT e.event_type, e.value, m.med9,
                 abs(e.value - m.med9) AS absdev
          FROM events e JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, round(quantile_cont(absdev, 0.5), 9) AS mad9
          FROM dev GROUP BY event_type),
        flg AS (
          SELECT d.event_type, d.med9, m.mad9,
                 d.absdev > round(3 * 1.4826 * m.mad9, 9) AS is_out
          FROM dev d JOIN mad m USING (event_type))
        SELECT event_type, count(*) AS n,
               round(max(med9), 6) AS med,
               round(max(mad9), 6) AS mad,
               count(CASE WHEN is_out THEN 1 END) AS n_outliers,
               round(CAST(count(CASE WHEN is_out THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS outlier_pct
        FROM flg
        GROUP BY event_type
        ORDER BY event_type""")),

    // A17 — rolling z-score anomaly flags: each event's value against the
    // mean/sample-stddev of the ±10-row window around it per user. The
    // windowed sums run over exact decimal casts (order-independent
    // addition — a raw-double rolling sum hash-diverges on summation
    // association between engines), then mean/var/z derive in double from
    // those exact sums: same IEEE operations, same operands, both
    // engines. Equal timestamps are totally ordered by event_id or the
    // frame itself would be nondeterministic.
    "a17_rolling_zscore" -> Q(
      fn = (s, dir) =>
        TimeSeriesOps.rollingZscore(
          t(s, dir, "events"), Seq("user_id"), "ts", "value",
          radius = 10, threshold = 2.0, tieBreak = Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("z"),
            col("is_anomaly"))
          .orderBy(col("event_id")),
      oracle = Some("""
        WITH w AS (
          SELECT event_id, user_id, value,
            CAST(count(*) OVER f AS DOUBLE) AS n,
            CAST(sum(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS s1,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) *
                          CAST(value AS DECIMAL(18,2))
                     AS DECIMAL(38,4))) OVER f AS DOUBLE) AS s2
          FROM events
          WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING)),
        z AS (
          SELECT event_id, user_id,
            CASE WHEN n > 1 AND (n * s2 - s1 * s1) / (n * (n - 1.0)) > 0
                 THEN round((value - s1 / n) /
                   sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))), 6)
            END AS z
          FROM w)
        SELECT event_id, user_id, z,
               coalesce(abs(z) > 2.0, false) AS is_anomaly
        FROM z
        ORDER BY event_id""")),

    // A18 — shuffle-key skew profile: the measurement that decides
    // between plain join, AQE skew split, and j9's salted join. Top-20
    // heaviest keys with occupancy share and skew factor (occupancy /
    // mean-key occupancy); ties at the cut break by key, so the top-k
    // SET is deterministic. Both engines divide the same integer
    // operands in double, so the rounded ratios hash-match.
    "a18_skew_profile" -> Q(
      fn = (s, dir) =>
        SkewOps.skewProfile(t(s, dir, "events"), Seq("user_id"), topK = 20)
          .orderBy(col("n").desc, col("user_id")),
      oracle = Some("""
        WITH c AS (SELECT user_id, count(*) AS n FROM events
                   GROUP BY user_id),
        s AS (SELECT sum(n) AS total, count(*) AS dst FROM c)
        SELECT c.user_id, c.n, round(c.n / s.total, 6) AS share,
               round(c.n / (s.total / s.dst), 6) AS skew
        FROM c, s
        ORDER BY n DESC, user_id
        LIMIT 20""")),

    // A19 — ordered LISTAGG: each user's event-type sequence as one
    // string, ordered by (ts, event_id) — the session-path feature
    // column. collect_list is unordered by contract, so the sort happens
    // INSIDE the row (array_sort over (ts, event_id, type) structs): the
    // aggregation stays partial-aggregable and the order is total.
    "a19_listagg" -> Q(
      fn = (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            array_join(
              transform(
                array_sort(collect_list(
                  struct(col("ts"), col("event_id"), col("event_type")))),
                x => x.getField("event_type")),
              ",").as("path"))
          .orderBy(col("user_id")),
      oracle = Some("""
        SELECT user_id, count(*) AS n_events,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // A21 — fixed-width histogram: 20 bins over [min, max] per event
    // type, empty bins surfaced with zero counts (a profile with holes
    // reads wrong) — the value-distribution profiling pass. Bin edges
    // derive from one stats row; bin index is pure arithmetic both
    // engines share; the bin grid is densified by a range join against
    // sequence() so the output shape is types × 20 regardless of data.
    "a21_histogram" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val stats = ev.groupBy(col("event_type")).agg(
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        val binned = ev.join(stats, "event_type")
          // hi == lo (single-valued group) must not divide by zero:
          // everything lands in bin 0, on both engines
          .withColumn("bin",
            when(col("hi") > col("lo"),
              least(lit(19), greatest(lit(0),
                floor((col("value") - col("lo")) * 20.0 /
                  (col("hi") - col("lo"))).cast("int"))))
              .otherwise(lit(0)))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"))
        stats
          .select(col("event_type"),
            explode(sequence(lit(0), lit(19))).as("bin"))
          .join(binned, Seq("event_type", "bin"), "left")
          .select(col("event_type"), col("bin"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("event_type"), col("bin"))
      },
      oracle = Some("""
        WITH s AS (
          SELECT event_type, min(value) AS lo, max(value) AS hi
          FROM events GROUP BY event_type),
        b AS (
          SELECT e.event_type,
                 CASE WHEN s.hi > s.lo THEN
                   least(19, greatest(0, CAST(floor(
                     (e.value - s.lo) * 20.0 / (s.hi - s.lo)) AS INT)))
                 ELSE 0 END AS bin,
                 count(*) AS n
          FROM events e JOIN s USING (event_type)
          GROUP BY 1, 2),
        g AS (
          SELECT s.event_type, CAST(i AS INT) AS bin
          FROM s, LATERAL (SELECT unnest(generate_series(0, 19)) AS i))
        SELECT g.event_type, g.bin, coalesce(b.n, 0) AS n
        FROM g LEFT JOIN b ON b.event_type = g.event_type
                          AND b.bin = g.bin
        ORDER BY g.event_type, g.bin""")),

    // A22 — winsorization: clamp each event's value to its type's
    // [p05, p95] — the outlier-taming cleaning pass. Exact percentiles
    // (same contract as a9) computed once per group and joined back;
    // the clamp is pure per-row. Exact-decimal rounding keeps the
    // emitted doubles engine-portable.
    "a22_winsorize" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        val cuts = ev.groupBy(col("event_type")).agg(
          percentile(col("value"), lit(0.05)).as("p05"),
          percentile(col("value"), lit(0.95)).as("p95"))
        ev.join(cuts, "event_type")
          .select(col("event_id"), col("event_type"),
            round(greatest(col("p05"), least(col("p95"), col("value"))), 6)
              .as("value_w"),
            (col("value") < col("p05") || col("value") > col("p95"))
              .as("clamped"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS p05,
                 quantile_cont(value, 0.95) AS p95
          FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type,
               round(greatest(c.p05, least(c.p95, e.value)), 6) AS value_w,
               (e.value < c.p05 OR e.value > c.p95) AS clamped
        FROM events e JOIN c USING (event_type)
        ORDER BY e.event_id""")),

    // A20 — general as-of join, merge_asof parity: every event matched to
    // the NEAREST reference event (event_id % 10 = 0) of its user within
    // a 2-hour tolerance; ties break backward. The oracle replays the
    // same union + two ignore-nulls window passes — matching is by row
    // presence via one struct per direction, so a null value can't
    // desync from its matched timestamp.
    "a20_asof_nearest" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
        TimeSeriesOps.asofJoin(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          ev.filter(col("event_id") % 10 === 0)
            .select(col("user_id"), col("ts"), col("value")),
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          valueCols = Seq("value"), direction = "nearest",
          toleranceSeconds = 7200)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_asof"), col("value_asof"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH l AS (SELECT event_id, user_id, ts FROM events),
        r AS (SELECT user_id, ts AS rts, value FROM events
              WHERE event_id % 10 = 0),
        u AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 CAST(NULL AS STRUCT(rts TIMESTAMP, value DOUBLE)) AS vr
          FROM l
          UNION ALL
          SELECT user_id, rts AS ts, 0, NULL,
                 struct_pack(rts := rts, value := value)
          FROM r),
        m AS (
          SELECT user_id, ts, is_left, event_id,
            last_value(vr IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts ASC, is_left ASC, vr ASC
               ROWS UNBOUNDED PRECEDING) AS back,
            last_value(vr IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY ts DESC, is_left ASC, vr ASC
               ROWS UNBOUNDED PRECEDING) AS fwd
          FROM u),
        p AS (
          SELECT event_id, user_id, ts,
            CASE WHEN back IS NULL THEN fwd
                 WHEN fwd IS NULL THEN back
                 WHEN abs(epoch_us(ts) - epoch_us(back.rts)) <=
                      abs(epoch_us(ts) - epoch_us(fwd.rts)) THEN back
                 ELSE fwd END AS pick
          FROM m WHERE is_left = 1),
        c AS (
          SELECT event_id, user_id, ts,
            CASE WHEN pick IS NOT NULL AND
                      abs(epoch_us(ts) - epoch_us(pick.rts)) <=
                        7200000000 THEN pick END AS pick
          FROM p)
        SELECT event_id, user_id, ts, pick.rts AS ts_asof,
               pick.value AS value_asof
        FROM c
        ORDER BY event_id"""))
  )
}
