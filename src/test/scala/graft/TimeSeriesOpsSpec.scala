package graft

import graft.operators.TimeSeriesOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def left: DataFrame =
    Seq(
      (1, "2024-01-01 10:00:00"),
      (2, "2024-01-01 12:00:00"),
      (3, "2024-01-01 09:00:00"))
      .toDF("id", "t").withColumn("t", to_timestamp($"t"))
      .withColumn("k", lit(1))

  private def right: DataFrame =
    Seq(
      ("2024-01-01 10:00:00", 111.0),
      ("2024-01-01 13:00:00", 222.0))
      .toDF("rt", "v").withColumn("rt", to_timestamp($"rt"))
      .withColumn("k", lit(1))

  test("asOfLookup backward tier includes coincident right row") {
    val out = TimeSeriesOps
      .asOfLookup(left, right, Seq("k"), "t", "rt", Seq("v"), forward = false)
      .collect().map(r => r.getAs[Int]("id") -> Option(r.getAs[Any]("v_asof")))
      .toMap
    assert(out(1) === Some(111.0)) // coincident: rts == t counts as <= t
    assert(out(2) === Some(111.0)) // last before
    assert(out(3) === None)        // nothing before, backward-only -> null
  }

  test("asOfLookup forward tier includes coincident right row") {
    val out = TimeSeriesOps
      .asOfLookup(left, right, Seq("k"), "t", "rt", Seq("v"), backward = false)
      .collect().map(r => r.getAs[Int]("id") -> Option(r.getAs[Any]("v_asof")))
      .toMap
    assert(out(1) === Some(111.0)) // coincident: rts == t counts as >= t
    assert(out(2) === Some(222.0)) // first after
    assert(out(3) === Some(111.0)) // first after (earlier than all rights)
  }

  test("asOfLookup backward-then-forward fallback chain") {
    val out = TimeSeriesOps
      .asOfLookup(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[Double]("v_asof"))
      .toMap
    assert(out(3) === 111.0) // no backward match -> forward tier
  }

  test("dedupWithin drops equal rows within the window, keeps others") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 5.0),
      (1, "2024-01-01 10:10:00", 5.0), // dup of previous (10 min)
      (1, "2024-01-01 10:20:00", 6.0), // different value -> kept
      (1, "2024-01-01 10:50:00", 5.0), // 50 min after first 5.0 -> kept
      (2, "2024-01-01 10:10:00", 5.0)) // other series -> kept
      .toDF("site", "t", "v").withColumn("t", to_timestamp($"t"))
    val kept = TimeSeriesOps
      .dedupWithin(df, Seq("site"), "t", 29 * 60, Seq("v"))
      .select("site", "t").as[(Int, java.sql.Timestamp)].collect().toSet
    assert(kept === Set(
      (1, ts("2024-01-01 10:00:00")),
      (1, ts("2024-01-01 10:20:00")),
      (1, ts("2024-01-01 10:50:00")),
      (2, ts("2024-01-01 10:10:00"))))
  }

  test("dedupWithin window boundary is [t-window, t): exact-boundary kept") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 5.0),
      (1, "2024-01-01 10:29:00", 5.0)) // exactly 29 min later -> inside
      .toDF("site", "t", "v").withColumn("t", to_timestamp($"t"))
    val kept = TimeSeriesOps
      .dedupWithin(df, Seq("site"), "t", 29 * 60, Seq("v"))
      .count()
    assert(kept === 1) // the 10:29 row IS a dup (>= t - 29min)
  }

  test("dedupWithin ties: coincident rows both dup of a strictly-earlier equal") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 5.0, "A"),
      (1, "2024-01-01 10:10:00", 5.0, "B"), // dup of A
      (1, "2024-01-01 10:10:00", 5.0, "C"), // coincident with B, dup of A
      (1, "2024-01-01 10:10:00", 6.0, "D")) // different value -> kept
      .toDF("site", "t", "v", "tag").withColumn("t", to_timestamp($"t"))
    val kept = TimeSeriesOps.dedupWithin(df, Seq("site"), "t", 29 * 60, Seq("v"))
      .select("tag").as[String].collect().sorted.toSeq
    assert(kept === Seq("A", "D"))
  }

  test("withLag emits previous value per series in time order") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 10.0),
      (1, "2024-01-01 11:00:00", 20.0),
      (2, "2024-01-01 10:00:00", 30.0))
      .toDF("site", "t", "v").withColumn("t", to_timestamp($"t"))
    val out = TimeSeriesOps.withLag(df, Seq("site"), "t", Seq("v"))
      .select("site", "t", "v_prev")
      .collect()
      .map(r => (r.getInt(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(out === Set(
      (1, ts("2024-01-01 10:00:00"), None),
      (1, ts("2024-01-01 11:00:00"), Some(10.0)),
      (2, ts("2024-01-01 10:00:00"), None)))
  }

  test("centeredWindowAgg averages over the +/- radius frame") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 10.0),
      (1, "2024-01-01 11:00:00", 20.0),
      (1, "2024-01-01 20:00:00", 100.0)) // outside +/-3h of the others
      .toDF("site", "t", "v").withColumn("t", to_timestamp($"t"))
    val out = TimeSeriesOps.centeredWindowAgg(
      df, Seq("site"), "t", 3 * 3600 + 1,
      spec = Map("v_avg" -> (c => avg(c))),
      srcCols = Map("v_avg" -> "v"))
      .select("t", "v_avg").as[(java.sql.Timestamp, Double)].collect().toMap
    assert(out(ts("2024-01-01 10:00:00")) === 15.0)
    assert(out(ts("2024-01-01 20:00:00")) === 100.0)
  }

  test("resample: daily grid per key's own span, gaps filled forward") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 10.0),
      (1, "2024-01-01 14:00:00", 20.0), // same bucket -> avg 15
      (1, "2024-01-03 10:00:00", 30.0), // Jan 2 is a gap
      (2, "2024-01-05 00:00:00", 5.0))  // other key, later span
      .toDF("user_id", "ts", "value").withColumn("ts", to_timestamp($"ts"))
    val out = TimeSeriesOps.resample(df, "user_id", "ts", "value", 86400L)
      .orderBy($"user_id", $"bucket_start")
      .as[(Int, Long, Long, Option[Double], Double, Boolean)].collect().toSeq
    val d = 86400L
    val jan1 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(out === Seq(
      (1, jan1, 2L, Some(15.0), 15.0, false),
      (1, jan1 + d, 0L, None, 15.0, true), // gap: carries Jan 1's avg
      (1, jan1 + 2 * d, 1L, Some(30.0), 30.0, false),
      (2, jan1 + 4 * d, 1L, Some(5.0), 5.0, false))) // own span only
  }

  test("resampleInterp: multi-bucket gaps interpolate linearly between " +
    "the nearest observations, observed buckets carry their own " +
    "average, single keys' spans stay independent") {
    val df = Seq(
      (1, "2024-01-01 10:00:00", 10.0),
      (1, "2024-01-01 14:00:00", 20.0), // bucket 0 -> avg 15
      // Jan 2 and Jan 3 are gaps; Jan 4 observes 45:
      //   thirds of the 15 -> 45 climb: 25, 35
      (1, "2024-01-04 10:00:00", 45.0),
      (2, "2024-01-05 00:00:00", 5.0)) // single bucket, no gaps
      .toDF("user_id", "ts", "value").withColumn("ts", to_timestamp($"ts"))
    val out = TimeSeriesOps.resampleInterp(
      df, "user_id", "ts", "value", 86400L)
      .orderBy($"user_id", $"bucket_start")
      .as[(Int, Long, Long, Option[Double], Option[Double], Boolean)]
      .collect().toSeq
    val d = 86400L
    val jan1 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(out === Seq(
      (1, jan1, 2L, Some(15.0), Some(15.0), false),
      (1, jan1 + d, 0L, None, Some(25.0), true),
      (1, jan1 + 2 * d, 0L, None, Some(35.0), true),
      (1, jan1 + 3 * d, 1L, Some(45.0), Some(45.0), false),
      (2, jan1 + 4 * d, 1L, Some(5.0), Some(5.0), false)))
  }

  test("pointInInterval == the naive inequality join on real data, and " +
    "the bucketed plan has no nested loop") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"ts", $"event_type")
    val iv = ev.groupBy($"event_type".as("itype"))
      .agg(min($"ts").as("s"))
      .withColumn("e", $"s" + expr("INTERVAL 36 HOURS"))
    val got = TimeSeriesOps.pointInInterval(ev, "ts", iv, "s", "e", 86400L)
      .select($"event_id", $"itype")
      .as[(Long, String)].collect().toSet
    val naive = ev.join(iv, $"ts" >= $"s" && $"ts" < $"e")
      .select($"event_id", $"itype")
      .as[(Long, String)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
    val p = TimeSeriesOps.pointInInterval(ev, "ts", iv, "s", "e", 86400L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"bucketed range join must not nested-loop:\n$p")
  }

  test("pointInInterval edges: boundary timestamps are [start, end), " +
    "empty intervals match nothing, bucket-straddling intervals match") {
    val pts = Seq(
      (1, "2024-01-01 00:00:00"),  // == start -> in
      (2, "2024-01-03 00:00:00"),  // == end -> out
      (3, "2024-01-02 23:59:59"),  // in, last second
      (4, "2024-01-05 12:00:00"))  // straddle case below
      .toDF("pid", "t").withColumn("t", to_timestamp($"t"))
    val ivs = Seq(
      (10, "2024-01-01 00:00:00", "2024-01-03 00:00:00"), // 2 days
      (11, "2024-01-04 00:00:00", "2024-01-04 00:00:00"), // empty
      (12, "2024-01-05 06:00:00", "2024-01-05 18:00:00")) // inside one day
      .toDF("iid", "s", "e")
      .withColumn("s", to_timestamp($"s")).withColumn("e", to_timestamp($"e"))
    val got = TimeSeriesOps.pointInInterval(pts, "t", ivs, "s", "e", 86400L)
      .select($"pid", $"iid").as[(Int, Int)].collect().toSet
    assert(got === Set((1, 10), (3, 10), (4, 12)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.pointInInterval(pts, "t", ivs, "s", "e", 0L)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.pointInInterval(
        pts.withColumn("__b", lit(1)), "t", ivs, "s", "e", 60L)
    }
  }

  test("pointInInterval sub-second precision: an interval ending on a " +
    "fractional second still matches points in its final bucket") {
    // bucket=60s, interval [10:00:00, 10:02:00.5): the last admissible
    // point lives in the 10:02 bucket — truncate-then-minus-one would
    // top the interval's bucket list out at 10:01 and drop it (r11
    // review finding)
    val pts = Seq(
      (1, "2024-01-01 10:02:00.2"),  // < end -> in (the dropped case)
      (2, "2024-01-01 10:02:00.5"),  // == end -> out
      (3, "2024-01-01 10:01:59.9"),  // in, earlier bucket
      (4, "2024-01-01 10:02:01.0"))  // > end -> out
      .toDF("pid", "t").withColumn("t", to_timestamp($"t"))
    val ivs = Seq((10, "2024-01-01 10:00:00", "2024-01-01 10:02:00.5"))
      .toDF("iid", "s", "e")
      .withColumn("s", to_timestamp($"s")).withColumn("e", to_timestamp($"e"))
    val got = TimeSeriesOps.pointInInterval(pts, "t", ivs, "s", "e", 60L)
      .select($"pid", $"iid").as[(Int, Int)].collect().toSet
    val naive = pts.join(ivs, $"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iid").as[(Int, Int)].collect().toSet
    assert(got === naive)
    assert(got === Set((1, 10), (3, 10)))
  }

  test("sessionize sub-second precision: gaps a fraction over/under the " +
    "threshold split exactly as the streaming twin would, and reserved " +
    "column names fail fast") {
    // true gap 1800.8s > 1800 -> two sessions (second-truncated epochs
    // would compute 1800 and merge them — r11 review finding)
    val over = Seq(
      (1L, "2024-01-01 10:00:00.1"), (1L, "2024-01-01 10:30:00.9"))
      .toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
    assert(TimeSeriesOps.sessionize(over, Seq("user_id"), "ts", 1800L)
      .count() === 2L)
    // true gap 1799.2s < 1800 -> one session of two events
    val under = Seq(
      (1L, "2024-01-01 10:00:00.9"), (1L, "2024-01-01 10:30:00.1"))
      .toDF("user_id", "ts").withColumn("ts", to_timestamp($"ts"))
    val one = TimeSeriesOps.sessionize(under, Seq("user_id"), "ts", 1800L)
      .select($"n_events").as[Long].collect().toSeq
    assert(one === Seq(2L))
    for (c <- Seq("__e", "__boundary", "session_no"))
      intercept[IllegalArgumentException] {
        TimeSeriesOps.sessionize(
          over.withColumn(c, lit(1)), Seq("user_id"), "ts", 1800L)
      }
  }

  test("funnel: greedy-earliest chains, strict-after steps, equal " +
    "timestamps cannot advance the chain, and broken chains stop") {
    def ev(rows: (Long, String, String)*) = rows.toSeq
      .zipWithIndex
      .map { case ((u, ts, ty), i) => (u, ts, ty, i.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", to_timestamp($"ts"))
    val events = ev(
      // user 1: full chain, but the EARLIEST A is the one that counts
      // even though a later A->B->C chain would also exist
      (1L, "2024-01-01 10:00:00", "A"),
      (1L, "2024-01-01 11:00:00", "A"),
      (1L, "2024-01-01 12:00:00", "B"),
      (1L, "2024-01-01 13:00:00", "C"),
      // user 2: B BEFORE the first A never counts; chain stops at A
      (2L, "2024-01-01 09:00:00", "B"),
      (2L, "2024-01-01 10:00:00", "A"),
      (2L, "2024-01-01 10:00:00", "C"),  // C without B: chain gap
      // user 3: B at the SAME instant as A — strict > rejects it
      (3L, "2024-01-01 10:00:00", "A"),
      (3L, "2024-01-01 10:00:00", "B"),
      // user 4: no A at all
      (4L, "2024-01-01 10:00:00", "B"))
    val got = TimeSeriesOps.funnel(
      events, Seq("user_id"), "ts", "event_type", Seq("A", "B", "C"),
      tieBreak = Seq("event_id"))
      .select($"user_id", $"step_1".cast("string"),
        $"step_2".cast("string"), $"step_3".cast("string"),
        $"steps_completed")
      .as[(Long, String, String, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00",
        "2024-01-01 13:00:00", 3),
      (2L, "2024-01-01 10:00:00", null, null, 1),
      (3L, "2024-01-01 10:00:00", null, null, 1),
      (4L, null, null, null, 0)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.funnel(events, Seq("user_id"), "ts", "event_type",
        Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.funnel(events, Seq("user_id"), "ts", "event_type", Nil)
    }
  }

  test("cohortRetention: cohorts form on the first event's period, " +
    "offsets count periods, retention is vs the day-0 size") {
    val events = Seq(
      // users 1,2 first seen day 0; user 1 returns day 2, user 2 doesn't
      (1L, "2024-01-01 09:00:00"), (2L, "2024-01-01 23:59:59"),
      (1L, "2024-01-03 00:00:00"),
      // user 3 first seen day 1, returns day 1 (same period counts once)
      (3L, "2024-01-02 08:00:00"), (3L, "2024-01-02 20:00:00"))
      .toDF("user_id", "ts")
      .withColumn("ts", to_timestamp($"ts"))
    val got = TimeSeriesOps.cohortRetention(events, "user_id", "ts", "day")
      .select($"cohort".cast("string"), $"period_offset", $"n_active",
        $"retention_pct")
      .as[(String, Int, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 2L, 100.0),
      ("2024-01-01", 2, 1L, 50.0),
      ("2024-01-02", 0, 1L, 100.0)))
    // week bucketing: 2024-01-01 is a Monday, so day 0..6 fold into
    // week offset 0 and day 7 into offset 1
    val wk = TimeSeriesOps.cohortRetention(
      events.union(Seq((2L, "2024-01-08 12:00:00")).toDF("user_id", "ts")
        .withColumn("ts", to_timestamp($"ts"))),
      "user_id", "ts", "week")
      .select($"cohort".cast("string"), $"period_offset", $"n_active")
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(wk === Seq(("2024-01-01", 0, 3L), ("2024-01-01", 1, 1L)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cohortRetention(events, "user_id", "ts", "hour")
    }
  }

  test("rollingZscore: hand-computed z against the ±radius frame, " +
    "zero-variance and singleton windows yield null, threshold flags") {
    val ts = (1 to 5).map(i => (1L, s"2024-01-01 10:0$i:00"))
    val vals = Seq(1.0, 1.0, 1.0, 1.0, 100.0)
    val df = ts.zip(vals).map { case ((k, t), v) => (k, t, v) }
      .toDF("k", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val got = TimeSeriesOps.rollingZscore(
      df, Seq("k"), "ts", "value", radius = 1, threshold = 0.6)
      .select($"ts".cast("string"), $"z", $"is_anomaly")
      .as[(String, Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    // rows 1-3 see constant windows (variance 0) -> null z, not flagged;
    // row 4 sees [1,1,100]: mean 34, sample var 3267, z = -33/√3267;
    // row 5 sees [1,100]: mean 50.5, var 4900.5, z = 49.5/√4900.5
    assert(got.map(_._2) === Seq(
      None, None, None, Some(-0.57735), Some(0.707107)))
    assert(got.map(_._3) === Seq(false, false, false, false, true))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.rollingZscore(df, Seq("k"), "ts", "value", 0)
    }
  }

  test("intervalOverlapJoin: touching endpoints overlap (closed), " +
    "disjoint and inverted intervals don't, bucket-straddling pairs " +
    "match, equals the naive inequality join") {
    def T(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, T("2024-01-01 10:00:00"), T("2024-01-01 12:00:00")),
      (2L, T("2024-01-01 20:00:00"), T("2024-01-01 21:00:00")),
      (3L, T("2024-01-01 12:00:00"), T("2024-01-01 11:00:00"))) // inverted
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, T("2024-01-01 12:00:00"), T("2024-01-01 13:00:00")), // touches 1
      (11L, T("2024-01-01 09:00:00"), T("2024-01-02 09:00:00")), // spans all
      (12L, T("2024-01-01 13:00:00"), T("2024-01-01 14:00:00"))) // disjoint
      .toDF("rid", "rs", "re")
    val got = TimeSeriesOps.intervalOverlapJoin(
      left, "ls", "le", right, "rs", "re", bucketSeconds = 1800L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 11L)))
    // naive quadratic join agrees
    val naive = left.filter($"le" >= $"ls").join(right)
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(naive === got)
    // true join semantics: duplicate input rows MULTIPLY (the canonical-
    // bucket match is one-per-pair, not a row-collapsing distinct)
    val dupd = TimeSeriesOps.intervalOverlapJoin(
      left.union(left), "ls", "le", right, "rs", "re", 1800L)
      .select($"lid", $"rid").as[(Long, Long)].collect()
    assert(dupd.length === 2 * got.size)
    // and the plan is an equi-join, never a nested loop
    val plan = TimeSeriesOps.intervalOverlapJoin(
      left, "ls", "le", right, "rs", "re", 1800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.intervalOverlapJoin(
        left.withColumn("__b", lit(1)), "ls", "le", right, "rs", "re", 60L)
    }
  }

  test("asofJoin: direction semantics, nearest ties break backward, " +
    "tolerance discards far matches, coincident rows match at distance " +
    "0, a null right VALUE still matches by row presence, guards") {
    def T(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, T("2024-01-01 10:00:00")),
      (2L, 10L, T("2024-01-01 12:00:00")), // equidistant 11:00/13:00
      (3L, 10L, T("2024-01-01 23:00:00")), // far from everything
      (4L, 20L, T("2024-01-01 11:00:00"))) // coincident with its ref
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, T("2024-01-01 11:00:00"), Some(1.0)),
      (10L, T("2024-01-01 13:00:00"), Some(3.0)),
      (20L, T("2024-01-01 11:00:00"), Option.empty[Double]))
      .toDF("k", "rts", "v")
    def run(dir: String, tol: Long = -1L) =
      TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"), direction = dir, toleranceSeconds = tol)
        .select($"id", $"rts_asof".cast("string"), $"v_asof")
        .as[(Long, Option[String], Option[Double])]
        .collect().sortBy(_._1).toSeq
    assert(run("nearest") === Seq(
      (1L, Some("2024-01-01 11:00:00"), Some(1.0)), // forward fills
      (2L, Some("2024-01-01 11:00:00"), Some(1.0)), // tie -> backward
      (3L, Some("2024-01-01 13:00:00"), Some(3.0)),
      (4L, Some("2024-01-01 11:00:00"), None))) // row matched, value null
    assert(run("backward").map(r => (r._1, r._2)) === Seq(
      (1L, None), // nothing at/before 10:00
      (2L, Some("2024-01-01 11:00:00")),
      (3L, Some("2024-01-01 13:00:00")),
      (4L, Some("2024-01-01 11:00:00"))))
    assert(run("forward").map(r => (r._1, r._2)) === Seq(
      (1L, Some("2024-01-01 11:00:00")),
      (2L, Some("2024-01-01 13:00:00")),
      (3L, None), // nothing at/after 23:00
      (4L, Some("2024-01-01 11:00:00"))))
    // 2h tolerance: id 3 is 10h from its nearest -> discarded
    assert(run("nearest", tol = 7200).map(r => (r._1, r._2.isDefined)) ===
      Seq((1L, true), (2L, true), (3L, false), (4L, true)))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"), direction = "sideways")
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.asofJoin(left.withColumn("__vr", lit(1)), right,
        Seq("k"), "ts", "rts", Seq("v"))
    }
  }

  test("mergeIntervals: overlapping and touching spans merge, " +
    "containment is swallowed, inverted intervals fail fast") {
    def iv(rows: (Long, String, String)*) = rows.toSeq
      .toDF("k", "s", "e")
      .withColumn("s", to_timestamp($"s"))
      .withColumn("e", to_timestamp($"e"))
    val intervals = iv(
      // overlap chain + a containing interval that swallows a later one
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (1L, "2024-01-01 11:00:00", "2024-01-01 11:10:00"), // contained
      (1L, "2024-01-01 11:30:00", "2024-01-01 13:00:00"),
      (1L, "2024-01-01 13:00:00", "2024-01-01 14:00:00"), // touching
      (1L, "2024-01-01 15:00:00", "2024-01-01 16:00:00"), // gap -> new
      // key 2: single interval
      (2L, "2024-01-01 00:00:00", "2024-01-01 00:00:00"))
    val got = TimeSeriesOps.mergeIntervals(intervals, Seq("k"), "s", "e")
      .select($"k", $"span_start".cast("string"),
        $"span_end".cast("string"), $"n_intervals")
      .as[(Long, String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 14:00:00", 4L),
      (1L, "2024-01-01 15:00:00", "2024-01-01 16:00:00", 1L),
      (2L, "2024-01-01 00:00:00", "2024-01-01 00:00:00", 1L)))
    val bad = iv((1L, "2024-01-01 10:00:00", "2024-01-01 09:00:00"))
    val ex = intercept[Exception] {
      TimeSeriesOps.mergeIntervals(bad, Seq("k"), "s", "e").collect()
    }
    assert(ex.getMessage.contains("mergeIntervals"))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.mergeIntervals(
        intervals.withColumn("span_no", lit(1)), Seq("k"), "s", "e")
    }

    // gaps are the spans' complement: key 1 has exactly one uncovered
    // window (14:00 -> 15:00, 3600s); key 2's single span yields none
    val gaps = TimeSeriesOps.intervalGaps(intervals, Seq("k"), "s", "e")
      .select($"k", $"gap_start".cast("string"),
        $"gap_end".cast("string"), $"gap_micros")
      .as[(Long, String, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gaps === Seq(
      (1L, "2024-01-01 14:00:00", "2024-01-01 15:00:00", 3600000000L)))
  }

  test("timeWeightedAvg: idle-then-spike reads near zero, tied " +
    "timestamps pair by the tie-break, zero spans surface null, one " +
    "shuffle total") {
    val rows = Seq(
      // g1: an hour at 0 then a 1s ramp to 10 — twa 5/3601, mean 10/3
      ("g1", 1L, "2024-01-01 00:00:00", 0.0),
      ("g1", 2L, "2024-01-01 01:00:00", 0.0),
      ("g1", 3L, "2024-01-01 01:00:01", 10.0),
      // g2: two samples at the SAME instant — pairing must follow the
      // tie-break (id): (0,100) over 0s, then (100,0) over 10s -> 50
      ("g2", 1L, "2024-01-01 00:00:10", 0.0),
      ("g2", 2L, "2024-01-01 00:00:10", 100.0),
      ("g2", 3L, "2024-01-01 00:00:20", 0.0),
      // g3: single sample -> zero span -> null twa
      ("g3", 1L, "2024-01-01 00:00:00", 7.0))
      .map { case (g, id, s, v) => (g, id, ts(s), v) }
      .toDF("g", "id", "t", "v")
    val out = TimeSeriesOps.timeWeightedAvg(rows, Seq("g"), "t", "v", "id")
      .as[(String, Long, Double, Option[Double])]
      .collect().sortBy(_._1).toSeq
    val g1Twa = BigDecimal(5.0 / 3601.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      ("g1", 3L, 3.333333, Some(g1Twa)),
      ("g2", 3L, 33.333333, Some(50.0)),
      ("g3", 1L, 7.0, None)))
    // window and final agg share the key partitioning: one exchange
    val p = TimeSeriesOps.timeWeightedAvg(rows, Seq("g"), "t", "v", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.timeWeightedAvg(
        rows.withColumn("twa", lit(1)), Seq("g"), "t", "v", "id")
    }
  }

  test("a30 ewma: window formula equals the recursive truncated-EWMA " +
    "reference on real data") {
    // reference: adjusted EWMA truncated at 10 lags, alpha=0.3 —
    // sum_{j=0..min(9,n-1)} v_{n-j}·0.7^j / sum 0.7^j, computed the naive
    // per-user way; the query must agree to float tolerance (the oracle
    // already pins exact bits, this pins the SEMANTICS)
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
    val ref = ev.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      val tail = vs.takeRight(10).reverse // newest first: lag j = index
      val num = tail.zipWithIndex.map { case (v, j) => v * math.pow(0.7, j) }.sum
      val den = tail.indices.map(j => math.pow(0.7, j)).sum
      u -> num / den
    }
    val out = SparkEntry.queries("a30_ewma")(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ewma").as[(Long, Double)].collect().toMap
    assert(out.keySet === ref.keySet)
    ref.foreach { case (u, e) =>
      assert(math.abs(out(u) - e) < 1e-4, s"user $u: ${out(u)} vs $e")
    }
  }

  test("a31 mad outliers: per-type counts equal the collected-data " +
    "median/MAD reference") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val ref = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = median(vs)
      val mad = median(vs.map(v => math.abs(v - med)))
      t -> (vs.size.toLong, vs.count(v => math.abs(v - med) > 3 * 1.4826 * mad).toLong)
    }
    val out = SparkEntry.queries("a31_mad_outliers")(
      spark, "/root/testdata/sf0.001")
      .select($"event_type", $"n", $"n_outliers")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === ref)
  }

  test("islands: sequential run ids restart per key, null values form " +
    "their own runs, ties follow the tie-break, one shuffle total") {
    val rows = Seq(
      // u1: a a b a ∅ ∅ a — five runs, nulls neither merge with
      // neighbors nor with each other's non-null flanks
      ("u1", 1L, "2024-01-01 10:00:00", Some("a")),
      ("u1", 2L, "2024-01-01 10:01:00", Some("a")),
      ("u1", 3L, "2024-01-01 10:02:00", Some("b")),
      ("u1", 4L, "2024-01-01 10:03:00", Some("a")),
      ("u1", 5L, "2024-01-01 10:04:00", None),
      ("u1", 6L, "2024-01-01 10:05:00", None),
      ("u1", 7L, "2024-01-01 10:06:00", Some("a")),
      // u2: FIRST row is null-valued — must still open run 1
      ("u2", 1L, "2024-01-01 09:00:00", None),
      ("u2", 2L, "2024-01-01 09:01:00", Some("x")),
      // u3: tied timestamps order by the tie-break (id): p then q,
      // so the coincident q joins the later q into one run of 2
      ("u3", 1L, "2024-01-01 08:00:00", Some("p")),
      ("u3", 2L, "2024-01-01 08:00:00", Some("q")),
      ("u3", 3L, "2024-01-01 08:01:00", Some("q")))
      .map { case (u, id, s, v) => (u, id, ts(s), v) }
      .toDF("u", "id", "t", "v")
    val out = TimeSeriesOps
      .islands(rows, Seq("u"), "t", "id", "v")
      .select($"u", $"run_id", $"v", $"run_len",
        date_format($"run_start", "HH:mm").as("s"),
        date_format($"run_end", "HH:mm").as("e"))
      .as[(String, Long, Option[String], Long, String, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      ("u1", 1L, Some("a"), 2L, "10:00", "10:01"),
      ("u1", 2L, Some("b"), 1L, "10:02", "10:02"),
      ("u1", 3L, Some("a"), 1L, "10:03", "10:03"),
      ("u1", 4L, None, 2L, "10:04", "10:05"),
      ("u1", 5L, Some("a"), 1L, "10:06", "10:06"),
      ("u2", 1L, None, 1L, "09:00", "09:00"),
      ("u2", 2L, Some("x"), 1L, "09:01", "09:01"),
      ("u3", 1L, Some("p"), 1L, "08:00", "08:00"),
      ("u3", 2L, Some("q"), 2L, "08:00", "08:01")))
    // both windows and the run aggregation ride ONE key exchange
    val p = TimeSeriesOps.islands(rows, Seq("u"), "t", "id", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.islands(
        rows.withColumn("run_id", lit(1)), Seq("u"), "t", "id", "v")
    }
  }

  test("centeredMeanPrefix: the O(n) decimal prefix-difference mean " +
    "equals a brute-force per-row frame mean exactly (inputs at ≤ 12 " +
    "dp), nulls fall out of both sum and count, an all-null frame " +
    "yields null, and all four window functions ride ONE exchange") {
    val r = 100L
    // irregular grid, 2 keys, values at 3 dp (exact in decimal(38,12)),
    // a null value, and a lone-row key
    val rows = Seq(
      (1L, 0L, Some(1.125)), (1L, 40L, Some(2.5)), (1L, 90L, None),
      (1L, 150L, Some(4.75)), (1L, 400L, Some(10.0)),
      (2L, 10L, Some(7.875)), (3L, 5L, Option.empty[Double]))
      .toDF("k", "sec", "v")
      .withColumn("t", timestamp_seconds($"sec"))
    val got = TimeSeriesOps.centeredMeanPrefix(
      rows, Seq("k"), "t", r, Map("m" -> "v"))
      .select($"k", $"sec", $"m").as[(Long, Long, Option[Double])]
      .collect().map(x => (x._1, x._2) -> x._3).toMap
    val data = Seq(
      (1L, 0L, Some(1.125)), (1L, 40L, Some(2.5)), (1L, 90L, None),
      (1L, 150L, Some(4.75)), (1L, 400L, Some(10.0)),
      (2L, 10L, Some(7.875)), (3L, 5L, Option.empty[Double]))
    data.foreach { case (k, s, _) =>
      val frame = data.filter(d =>
        d._1 == k && d._2 >= s - r && d._2 <= s + r).flatMap(_._3)
      val want =
        if (frame.isEmpty) None
        else Some(frame.map(BigDecimal(_)).sum.toDouble / frame.length)
      assert(got((k, s)) === want, s"key $k sec $s")
    }
    val p = TimeSeriesOps.centeredMeanPrefix(
      rows, Seq("k"), "t", r, Map("m" -> "v"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    // the incremental frame shape, not the sliding one: no centered
    // RANGE frame survives in the plan
    assert(!p.contains("RANGE BETWEEN -"), p)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.centeredMeanPrefix(rows, Seq("k"), "t", -1,
        Map("m" -> "v"))
    }
  }

  test("olsTrend: exact slope/intercept/r2 on a perfect line, flat " +
    "series -> slope 0 and null r2, single point -> all null, yScale " +
    "guard") {
    // "up": value = 2.0 + 0.01·i at 864 s steps (0.01 day) — exactly
    // +1.0 value/day, and y×100 is integer-linear so every moment sum
    // is exact; "flat": constant (den2 = 0); "one": a single point
    // (den = 0)
    val rows =
      (0 until 50).map(i => ("up", 864L * i, 2.0 + 0.01 * i)) ++
      (0 until 10).map(i => ("flat", 3600L * i, 5.0)) :+
      (("one", 0L, 7.0))
    val df = rows.toDF("k", "secs", "value")
      .select($"k", timestamp_seconds($"secs" + lit(1704067200L)).as("ts"),
        $"value")
    val out = TimeSeriesOps.olsTrend(df, Seq("k"), "ts", "value")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("up")._2 === 50L)
    assert(out("up")._3 === Some(1.0))
    assert(out("up")._4 === Some(2.0))
    assert(out("up")._5 === Some(1.0))
    assert(out("flat")._3 === Some(0.0))
    assert(out("flat")._4 === Some(5.0))
    assert(out("flat")._5 === None, "zero y-variance -> r2 undefined")
    assert(out("one")._3 === None)
    assert(out("one")._4 === None)
    assert(out("one")._5 === None)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.olsTrend(df, Seq("k"), "ts", "value", yScale = 0)
    }
  }

  test("ols summary algebra: merge of arbitrary splits === one-shot " +
    "summarize, and the estimate off merged state === olsTrend") {
    val rows = (0 until 90).map(i =>
      (if (i % 2 == 0) "a" else "b", 600L * i,
        1.0 + 0.07 * (i % 13) + 0.002 * i))
    val df = rows.toDF("k", "secs", "value")
      .select($"k", timestamp_seconds($"secs" + lit(1704067200L)).as("ts"),
        $"value")
    def dump(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toSeq).toSeq
    val oneShot = TimeSeriesOps.olsSummarize(df, Seq("k"), "ts", "value")
    // three uneven splits by wall-clock minute
    val s1 = TimeSeriesOps.olsSummarize(
      df.filter(minute($"ts") < 10), Seq("k"), "ts", "value")
    val s2 = TimeSeriesOps.olsSummarize(
      df.filter(minute($"ts") >= 10 && minute($"ts") < 40),
      Seq("k"), "ts", "value")
    val s3 = TimeSeriesOps.olsSummarize(
      df.filter(minute($"ts") >= 40), Seq("k"), "ts", "value")
    val merged = TimeSeriesOps.olsMerge(
      s1.unionByName(s2).unionByName(s3), Seq("k"))
    assert(dump(merged) === dump(oneShot), "moment sums are additive")
    assert(dump(TimeSeriesOps.olsEstimate(merged, Seq("k"))) ===
      dump(TimeSeriesOps.olsTrend(df, Seq("k"), "ts", "value")))
  }

  test("globalRowNumber: partition-offset two-pass equals the global " +
    "window across partition counts, heavy ties, and a parts > rows " +
    "degenerate split") {
    val rng = new scala.util.Random(46)
    // heavy ties on the key force rows across range boundaries; the
    // id tie-break makes the order total
    val rows = (0L until 400L).map(i => (i, rng.nextInt(12)))
    val df = rows.toDF("id", "k")
    val viaWindow = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"k", $"id"))
        .cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 2, 7, 32, 1000)) {
      val got = TimeSeriesOps.globalRowNumber(
        df, Seq($"k", $"id"), numParts = parts)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      assert(got === viaWindow, s"parts=$parts")
    }
  }

  test("globalPrefixSum: partition-offset running totals equal the " +
    "global window across partition counts, two columns at once, " +
    "negatives included") {
    val rng = new scala.util.Random(47)
    val rows = (0L until 300L).map(i =>
      (i, rng.nextInt(9), rng.nextInt(100).toLong,
        (rng.nextInt(41) - 20).toLong))
    val df = rows.toDF("id", "k", "a", "b")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"k", $"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val viaWindow = df
      .withColumn("ca", sum($"a").over(w))
      .withColumn("cb", sum($"b").over(w))
      .select($"id", $"ca", $"cb").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (parts <- Seq(1, 2, 7, 32, 1000)) {
      val got = TimeSeriesOps.globalPrefixSum(
        df, Seq($"k", $"id"), Seq("a", "b"), numParts = parts)
        .select($"id", $"a_cum", $"b_cum").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === viaWindow, s"parts=$parts")
    }
  }

  /** Deterministic pseudo-random series fixture for the bucket-and-carry
    * equivalence tests: 3 series keys INCLUDING null, timestamps dense
    * enough that bucket boundaries land mid-series, duplicate sensor
    * tuples at varying gaps, null values, and coincident-second rows
    * disambiguated by id (the tie-break).
    */
  private def carryFixture(n: Int, seed: Long): DataFrame = {
    val rng = new scala.util.Random(seed)
    val keys = Array[Integer](1, 2, null)
    val rows = (0 until n).map { i =>
      val k = keys(rng.nextInt(3))
      // 0..6 h span in uneven steps; ~5% exact repeats of the prior second
      val t = 1704067200L + rng.nextInt(6 * 3600)
      val v: java.lang.Double =
        if (rng.nextInt(10) == 0) null else rng.nextInt(5).toDouble
      (i.toLong, k, new java.sql.Timestamp(t * 1000L), v)
    }
    rows.toDF("id", "k", "t", "v")
  }

  test("withLagBucketed == withLag: null keys, null values, boundary " +
    "rows, ties — every bucket width") {
    val df = carryFixture(500, seed = 42)
    val expected = TimeSeriesOps
      .withLag(df, Seq("k"), "t", Seq("v"), tieBreak = Seq("id"))
      .select($"id", $"v_prev").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    for (b <- Seq(60L, 1740L, 3600L, 86400L)) {
      val got = TimeSeriesOps
        .withLagBucketed(df, Seq("k"), "t", Seq("v"), bucketSeconds = b,
          tieBreak = Seq("id"))
        .select($"id", $"v_prev").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got === expected, s"bucketSeconds=$b")
    }
  }

  test("withLagBucketed: first row of a series carries null across any " +
    "number of leading empty buckets") {
    val df = Seq(
      (1L, 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 1.0),
      (2L, 1, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 2.0))
      .toDF("id", "k", "t", "v")
    val got = TimeSeriesOps
      .withLagBucketed(df, Seq("k"), "t", Seq("v"), bucketSeconds = 3600L)
      .select($"id", $"v_prev").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> None, 2L -> Some(1.0)))
  }

  test("withLagBucketed matches withLag's SCHEMA exactly on a " +
    "pre-existing <col>_prev: replaced IN PLACE, same column order " +
    "(ADVICE r16 — positional consumers must see identical frames)") {
    val df = carryFixture(50, seed = 3)
      .withColumn("v_prev", lit(-1.0))   // stale column, mid-schema
      .withColumn("w", col("v") * 2)     // and something after it
    val win = TimeSeriesOps.withLag(df, Seq("k"), "t", Seq("v"),
      tieBreak = Seq("id"))
    val buck = TimeSeriesOps.withLagBucketed(df, Seq("k"), "t", Seq("v"),
      bucketSeconds = 3600L, tieBreak = Seq("id"))
    assert(buck.columns.toSeq === win.columns.toSeq,
      "column ORDER must match withColumn's in-place replacement")
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(buck.collect().map(r => key(r) -> r.toSeq).toMap ===
      win.collect().map(r => key(r) -> r.toSeq).toMap)
  }

  test("withLagBucketed rejects non-positive buckets and reserved columns") {
    val df = carryFixture(10, seed = 1)
    intercept[IllegalArgumentException] {
      TimeSeriesOps.withLagBucketed(df, Seq("k"), "t", Seq("v"), 0L)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.withLagBucketed(
        df.withColumn("__b", lit(1)), Seq("k"), "t", Seq("v"), 60L)
    }
  }

  test("dedupWithinBucketed == dedupWithin: kept set AND markOnly flags " +
    "match at every legal bucket width") {
    val df = carryFixture(500, seed = 7)
    def flags(out: DataFrame): Map[Long, Boolean] =
      out.select($"id", $"__is_dup").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expected = flags(TimeSeriesOps.dedupWithin(
      df, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
      markOnly = true))
    for (b <- Seq(1740L, 3600L, 7200L, 86400L)) {
      val got = flags(TimeSeriesOps.dedupWithinBucketed(
        df, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
        bucketSeconds = b, markOnly = true))
      assert(got === expected, s"bucketSeconds=$b")
      // and the filtering form keeps exactly the unflagged rows
      val kept = TimeSeriesOps.dedupWithinBucketed(
        df, Seq("k"), "t", 1740L, Seq("v"), bucketSeconds = b)
        .select($"id").as[Long].collect().toSet
      assert(kept === expected.filter(!_._2).keySet, s"bucketSeconds=$b")
    }
  }

  test("dedupWithinBucketed refuses a near-unique partition key (the " +
    "measured 2x-loss misuse), stays silent on the identical-tuple " +
    "flood it exists for, and keyWidthGuard = false overrides") {
    // near-unique: every (k, v) tuple distinct -> bucket-and-carry's
    // summary is corpus-sized (SCALE.md §10b finding 2's shape)
    val wide = (0 until 3000).map { i =>
      (i.toLong, i, new java.sql.Timestamp(1704067200000L + i * 1000L),
        i.toDouble)
    }.toDF("id", "k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.dedupWithinBucketed(
        wide, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
        bucketSeconds = 3600L)
    }
    assert(e.getMessage.contains("near-unique"))
    // flood: 3000 rows over 3 groups -> guard silent, operator runs
    val flood = (0 until 3000).map { i =>
      (i.toLong, i % 3, new java.sql.Timestamp(1704067200000L + i * 1000L),
        1.0)
    }.toDF("id", "k", "t", "v")
    val kept = TimeSeriesOps.dedupWithinBucketed(
      flood, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
      bucketSeconds = 3600L)
      .count()
    assert(kept > 0)
    // override: the caller who knows the head is unrepresentative
    val forced = TimeSeriesOps.dedupWithinBucketed(
      wide, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
      bucketSeconds = 3600L, keyWidthGuard = false)
    assert(forced.count() === 3000L) // all tuples distinct: nothing drops
  }

  test("dedupWithinBucketed: in-window predecessor exactly one bucket " +
    "back is seen; window-boundary row (ts - window) is IN the window") {
    val df = Seq(
      // bucket 0 ends at :29:00 (1740 s buckets); row B sits in bucket 1
      // exactly windowSeconds after row A -> still a duplicate
      (1L, 1, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 5.0),
      (2L, 1, java.sql.Timestamp.valueOf("2024-01-01 00:34:00"), 5.0),
      // 1741 s after row B -> strictly outside, kept
      (3L, 1, java.sql.Timestamp.valueOf("2024-01-01 01:03:01"), 5.0))
      .toDF("id", "k", "t", "v")
    val kept = TimeSeriesOps.dedupWithinBucketed(
      df, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
      bucketSeconds = 1740L)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.dedupWithinBucketed(
        df, Seq("k"), "t", windowSeconds = 1740L, cmpCols = Seq("v"),
        bucketSeconds = 1739L) // < window: prev-bucket carry insufficient
    }
  }
}
