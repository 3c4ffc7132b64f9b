package graft

import graft.operators.LevelPipeline
import graft.operators.LevelPipeline.Station
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LevelPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  private val station1 = Station(
    site_no = 1, beta = 0.01, ref_pressure = 1000.0, ref_intensity = 100.0,
    elev_scaling = 1.0, latit_scaling = 1.0, n0_cal = 100.0,
    bulk_density = 1.0, lattice_water_g_g = 0.05,
    soil_organic_matter_g_g = 0.05)
  private val stationSandy = station1.copy(
    site_no = 2, alternate_algorithm = Some("sandy"))
  private def stations = Seq(station1, stationSandy).toDF()

  /** Raw fixture row with all 14 sensor fields. */
  private def rawRow(
      t: String, count: Long, battery: Double, p1: Double, p2: Double,
      extT: Double, extH: Double, rain: Double) =
    (1, T(t), count, battery, p1, p2, extT, extH, rain,
      20.0, 30.0, 21.0, 31.0, 0.1, 0.2, 0.3, 0)

  private def rawDf(rows: Seq[(Int, java.sql.Timestamp, Long, Double, Double,
      Double, Double, Double, Double, Double, Double, Double, Double, Double,
      Double, Double, Int)]): DataFrame =
    rows.toDF("site_no", "time", "count", "battery", "pressure1", "pressure2",
      "external_temperature", "external_humidity", "rain",
      "internal_temperature", "internal_humidity", "tube_temperature",
      "tube_humidity", "vwc1", "vwc2", "vwc3", "flag")

  test("level1: first-row skip, dup drop, lag-before-dedup, flag rule") {
    val raw = rawDf(Seq(
      rawRow("2024-01-01 10:00:00", 100, 12.0, 1000, 0, 20, 50, 0),
      rawRow("2024-01-01 11:00:00", 100, 12.0, 1000, 0, 20, 50, 0),
      // exact duplicate of the 11:00 row, 10 min later -> dropped, but its
      // count still feeds the next row's prev_count
      rawRow("2024-01-01 11:10:00", 100, 12.0, 1000, 0, 20, 50, 0),
      // 130 > 1.2 * 100 -> flag 1 (prev comes from the DROPPED duplicate)
      rawRow("2024-01-01 12:00:00", 130, 12.0, 1000, 0, 20, 50, 0),
      // battery < 10 wins over the count rule -> flag 4
      rawRow("2024-01-01 13:00:00", 50, 5.0, 1000, 0, 20, 50, 0)))
    val out = LevelPipeline.level1(raw)
      .select("time", "flag").as[(java.sql.Timestamp, Int)].collect().toMap
    assert(out === Map(
      T("2024-01-01 11:00:00") -> 0, // within [80,120] of prev 100
      T("2024-01-01 12:00:00") -> 1,
      T("2024-01-01 13:00:00") -> 4))
  }

  test("level1: corrupt rows (count and battery both null) are dropped") {
    val good: DataFrame = rawDf(Seq(
      rawRow("2024-01-01 10:00:00", 100, 12.0, 1000, 0, 20, 50, 0),
      rawRow("2024-01-01 11:00:00", 100, 12.0, 1000, 0, 20, 50, 0)))
    val raw = good.unionByName(
        Seq((1, T("2024-01-01 12:00:00"))).toDF("site_no", "time")
          .withColumn("count", lit(null).cast("long"))
          .withColumn("battery", lit(null).cast("double"))
          .withColumn("pressure1", lit(1000.0))
          .withColumn("pressure2", lit(0.0))
          .withColumn("external_temperature", lit(20.0))
          .withColumn("external_humidity", lit(50.0))
          .withColumn("rain", lit(0.0))
          .withColumn("internal_temperature", lit(20.0))
          .withColumn("internal_humidity", lit(30.0))
          .withColumn("tube_temperature", lit(21.0))
          .withColumn("tube_humidity", lit(31.0))
          .withColumn("vwc1", lit(0.1)).withColumn("vwc2", lit(0.2))
          .withColumn("vwc3", lit(0.3)).withColumn("flag", lit(0))
          .select(good.columns.map(col): _*))
    val out = LevelPipeline.level1(raw).select("time")
      .as[java.sql.Timestamp].collect().toSet
    assert(out === Set(T("2024-01-01 11:00:00")))
  }

  private def wv(t: Double, h: Double): Double =
    1.0 + 0.0054 * ((2165.0 * ((0.6108 * math.exp((17.27 * t) / (t + 237.3))) *
      (h / 100.0))) / (t + 273.16))

  test("level2: correction chain with silo fallback and as-of tiers") {
    val l1 = rawDf(Seq(
      // ext zero -> SILO branch; both pressures zero -> press_corr 1.0;
      // same-hour intensity 110 -> corr 1.1
      rawRow("2024-01-01 11:00:00", 100, 12.0, 0, 0, 0, 50, 2.0),
      // normal externals; p2 wins; no same-hour -> backward 110
      rawRow("2024-01-01 12:00:00", 130, 12.0, 1000, 1005, 20, 50, 0)))
      .withColumn("flag", lit(0))
    val silo = Seq(
      (1, T("2024-01-01 08:00:00"), 10.0, 60.0),
      (1, T("2024-01-01 13:00:00"), 99.0, 99.0)) // past 11:59 -> excluded
      .toDF("site_no", "time", "average_temperature", "average_humidity")
    val intensity = Seq(
      (1, T("2024-01-01 11:00:00"), 110.0))
      .toDF("site_no", "time", "intensity")
    val out = LevelPipeline.level2(l1, stations, silo, intensity)
      .select("time", "press_corr", "wv_corr", "intensity_corr",
        "corr_count", "rain")
      .collect().map(r => r.getTimestamp(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap

    val (p1c, w1c, i1c, c1c, rain1) = out(T("2024-01-01 11:00:00"))
    assert(p1c === 1.0)
    assert(w1c === wv(10.0, 60.0)) // SILO morning row, decoy excluded
    assert(i1c === 1.1)
    assert(c1c === (100 * w1c * 1.0 / 1.1) / 1.0)
    assert(rain1 === 2.0) // rain carried through (J5 avoided)

    val (p2c, w2c, i2c, c2c, _) = out(T("2024-01-01 12:00:00"))
    assert(p2c === math.exp(0.01 * (1005 - 1000)))
    assert(w2c === wv(20.0, 50.0))
    assert(i2c === 1.1) // backward as-of pick
    assert(c2c === (130 * w2c * p2c / 1.1) / 1.0)
  }

  test("level2 emulateOldVersion: backward FIRST pick + legacy wv store") {
    val l1 = rawDf(Seq(
      // no same-hour intensity; one ext zero and no silo row -> mixed tier
      rawRow("2024-01-02 12:30:00", 100, 12.0, 1000, 1005, 0, 50, 0)))
      .withColumn("flag", lit(0))
    val silo = Seq((99, T("2024-01-01 08:00:00"), 10.0, 60.0)) // other site
      .toDF("site_no", "time", "average_temperature", "average_humidity")
    val intensity = Seq(
      (1, T("2024-01-02 09:00:00"), 80.0),   // earliest before t
      (1, T("2024-01-02 11:00:00"), 120.0))  // latest before t
      .toDF("site_no", "time", "intensity")

    val modern = LevelPipeline.level2(l1, stations, silo, intensity)
      .select("wv_corr", "intensity_corr").head()
    val legacy = LevelPipeline
      .level2(l1, stations, silo, intensity, emulateOldVersion = true)
      .select("wv_corr", "intensity_corr").head()

    // modern: LAST before t -> 120/100; mixed-tier wv computed from ext_h
    assert(modern.getDouble(1) === 1.2)
    assert(modern.getDouble(0) !== 1.0)
    // legacy: FIRST before t -> 80/100; stored wv forced to 1.0
    assert(legacy.getDouble(1) === 0.8)
    assert(legacy.getDouble(0) === 1.0)
  }

  test("level3: default + sandy conversions and flag thresholds") {
    val l2 = Seq(
      // default site: corr in band -> flag carried (0)
      (1, T("2024-01-01 10:00:00"), 0, 90.0, 1.05, 1.0),
      // default: corr > n0 -> 3; corr < 0.4*n0 -> 2; wv == 1.0 -> 5
      (1, T("2024-01-01 11:00:00"), 0, 150.0, 1.05, 0.0),
      (1, T("2024-01-01 12:00:00"), 0, 30.0, 1.05, 0.0),
      (1, T("2024-01-01 13:00:00"), 0, 90.0, 1.0, 0.0),
      // sandy site: thresholds are 3*n0 / 0.5*n0
      (2, T("2024-01-01 10:00:00"), 0, 200.0, 1.05, 0.0), // in band
      (2, T("2024-01-01 11:00:00"), 0, 301.0, 1.05, 0.0), // > 300 -> 3
      (2, T("2024-01-01 12:00:00"), 0, 49.0, 1.05, 0.0))  // < 50 -> 2
      .toDF("site_no", "time", "flag", "corr_count", "wv_corr", "rain")
    val out = LevelPipeline.level3(l2, stations)
      .select("site_no", "time", "flag", "soil_moist", "effective_depth")
      .collect()
      .map(r => (r.getInt(0), r.getTimestamp(1)) ->
        (r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap

    assert(out((1, T("2024-01-01 10:00:00")))._1 === 0)
    assert(out((1, T("2024-01-01 11:00:00")))._1 === 3)
    assert(out((1, T("2024-01-01 12:00:00")))._1 === 2)
    assert(out((1, T("2024-01-01 13:00:00")))._1 === 5)
    assert(out((2, T("2024-01-01 10:00:00")))._1 === 0)
    assert(out((2, T("2024-01-01 11:00:00")))._1 === 3)
    assert(out((2, T("2024-01-01 12:00:00")))._1 === 2)

    val cmDefault = (0.0808 / (90.0 / 100.0 - 0.372) - 0.115 - 0.1) * 1.0
    val (_, sm, ed) = out((1, T("2024-01-01 10:00:00")))
    assert(sm === cmDefault * 100.0)
    assert(ed === 5.8 / (0.1 * 1.0 + cmDefault + 0.0829))

    val cmSandy = 1216036430.0 * math.pow(200.0, -3.272)
    assert(out((2, T("2024-01-01 10:00:00")))._2 === cmSandy * 100.0)
  }

  test("level4: +/-3h window mean over valid rows only") {
    val l3 = Seq(
      (1, T("2024-01-01 10:00:00"), 0, 10.0, 1.0, 0.0),
      (1, T("2024-01-01 11:00:00"), 1, 99.0, 9.0, 0.0), // invalid: excluded
      (1, T("2024-01-01 13:00:00"), 0, 20.0, 2.0, 0.0), // within 3h+1s
      (1, T("2024-01-01 20:00:00"), 0, 50.0, 5.0, 0.0)) // isolated
      .toDF("site_no", "time", "flag", "soil_moist", "effective_depth",
        "rainfall")
    val out = LevelPipeline.level4(l3)
      .select("time", "soil_moist_filtered", "depth_filtered")
      .collect().map(r => r.getTimestamp(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(T("2024-01-01 10:00:00")) === ((15.0, 1.5)))
    assert(out(T("2024-01-01 13:00:00")) === ((15.0, 1.5)))
    assert(out(T("2024-01-01 20:00:00")) === ((50.0, 5.0))) // own-row mean
    assert(!out.contains(T("2024-01-01 11:00:00")))
  }

  test("processLevels end-to-end smoke: chain composes") {
    val raw = rawDf(Seq(
      rawRow("2024-01-01 10:00:00", 100, 12.0, 1000, 1005, 20, 50, 0),
      rawRow("2024-01-01 11:00:00", 100, 12.0, 1000, 1005, 20, 50, 5.0),
      rawRow("2024-01-01 12:00:00", 101, 12.0, 1000, 1005, 20, 50, 0)))
    val silo = Seq((1, T("2024-01-01 08:00:00"), 10.0, 60.0))
      .toDF("site_no", "time", "average_temperature", "average_humidity")
    // corr 1.3 keeps corr_count ~90 inside the (0.4*n0, n0) valid band
    val intensity = Seq((1, T("2024-01-01 11:00:00"), 130.0))
      .toDF("site_no", "time", "intensity")
    val out = LevelPipeline.processLevels(raw, stations, silo, intensity)
      .select("time", "rainfall").as[(java.sql.Timestamp, Double)]
      .collect().toMap
    assert(out.keySet === Set(
      T("2024-01-01 11:00:00"), T("2024-01-01 12:00:00")))
    assert(out(T("2024-01-01 11:00:00")) === 1.0) // 5 tips * 0.2 mm
  }

  test("processLevels with the j11 bucketed as-of hatch equals the " +
    "union-form chain row for row on the full sf0.001 fixture — the " +
    "hatch changes the PLAN under a hot site, never the answer") {
    val dir = "/root/testdata/sf0.001"
    val stations5 = graft.queries.PipelineQueries.stationsDf(spark)
    val silo5 = graft.queries.PipelineQueries.siloDf(spark)
    val inten5 = graft.queries.PipelineQueries.intensityDf(spark)
    val raw5 = graft.queries.PipelineQueries.rawDf(spark, dir)
    def rows(bucket: Option[Long]) =
      LevelPipeline.processLevels(raw5, stations5, silo5, inten5,
        bucketedAsofSeconds = bucket)
        .collect().map(_.toString).sorted.toSeq
    val union = rows(None)
    assert(union.nonEmpty)
    // a bucket width smaller than the intensity cadence gap forces real
    // cross-bucket carries; a day-wide one mostly stays in-bucket —
    // both must match the union form exactly
    assert(rows(Some(3600L)) === union)
    assert(rows(Some(86400L)) === union)
    intercept[IllegalArgumentException] {
      LevelPipeline.level2(raw5, stations5, silo5, inten5,
        emulateOldVersion = true, bucketedAsofSeconds = Some(3600L))
    }
  }

  test("level1 bucket-and-carry equals the window form row for row on " +
    "the full sf0.001 fixture — the hot-series hatch changes the PLAN, " +
    "never the answer (lag-before-dedup order preserved)") {
    val raw5 = graft.queries.PipelineQueries.rawDf(spark, "/root/testdata/sf0.001")
    val plain = LevelPipeline.level1(raw5)
      .collect().map(_.toString).sorted.toSeq
    assert(plain.nonEmpty)
    // half-hour buckets force real cross-bucket carries at the fixture's
    // 30-min cadence; 6 h is the production default
    for (b <- Seq(1800L, 21600L)) {
      val bucketed = LevelPipeline.level1(raw5, bucketSeconds = Some(b))
        .collect().map(_.toString).sorted.toSeq
      assert(bucketed === plain, s"bucketSeconds=$b")
    }
  }

  test("planSkew: the hot fixture auto-selects the bucketed hatches, the " +
    "uniform fixture does not — and autoSkew threads the decision " +
    "through processLevels with the answer unchanged") {
    import org.apache.spark.sql.functions.{col => C}
    val raw5 = graft.queries.PipelineQueries.rawDf(spark, "/root/testdata/sf0.001")
    // uniform: 5 synthetic sites at equal cadence -> share ~0.2
    val uniformPlan = LevelPipeline.planSkew(raw5)
    assert(uniformPlan.topShare < 0.5)
    assert(uniformPlan.bucketedAsofSeconds.isEmpty)
    assert(uniformPlan.bucketedLevel1Seconds.isEmpty)
    // hot: replicate site 0 until it holds >= 60% of rows
    val hot = raw5.unionByName(
      raw5.filter(C("site_no") === 0).crossJoin(
        spark.range(4).select(C("id").as("__r")))
        .withColumn("time",
          expr("time + make_interval(0, 0, 0, 0, 0, 0, __r + 1)"))
        .drop("__r"))
    val hotPlan = LevelPipeline.planSkew(hot)
    assert(hotPlan.topShare >= 0.5)
    assert(hotPlan.bucketedAsofSeconds === Some(21600L))
    assert(hotPlan.bucketedLevel1Seconds === Some(21600L))
    // autoSkew-on equals hatches-off on the UNIFORM fixture (where the
    // plan resolves to no hatches) and equals explicitly-bucketed on a
    // small hot slice, so the switch can never change values
    val stations5 = graft.queries.PipelineQueries.stationsDf(spark)
    val silo5 = graft.queries.PipelineQueries.siloDf(spark)
    val inten5 = graft.queries.PipelineQueries.intensityDf(spark)
    val auto = LevelPipeline.processLevels(raw5, stations5, silo5, inten5,
      autoSkew = true).collect().map(_.toString).sorted.toSeq
    val manual = LevelPipeline.processLevels(raw5, stations5, silo5, inten5)
      .collect().map(_.toString).sorted.toSeq
    assert(auto === manual)
    // force the hot branch end-to-end at a low threshold: both hatches
    // engage and the chain still matches the default plan's rows
    val autoHot = LevelPipeline.processLevels(raw5, stations5, silo5, inten5,
      autoSkew = true, autoSkewThreshold = 0.1)
      .collect().map(_.toString).sorted.toSeq
    assert(autoHot === manual)
    // TWO comparable hot sites (VERDICT r17 item 7): neither clears the
    // top-1 threshold alone, the qualified summed share does — the
    // hatches engage through the multi-hot arm, and the chain through
    // them still matches the default plan row for row
    val twoHot = raw5.unionByName(
      raw5.filter(C("site_no").isin(0, 1)).crossJoin(
        spark.range(6).select(C("id").as("__r")))
        .withColumn("time",
          expr("time + make_interval(0, 0, 0, 0, 0, 0, __r + 1)"))
        .drop("__r"))
    val twoHotPlan = LevelPipeline.planSkew(twoHot)
    assert(twoHotPlan.topShare < 0.5,
      s"fixture must keep each hot site under the top-1 threshold, " +
        s"got ${twoHotPlan.topShare}")
    assert(twoHotPlan.hotSetShare >= 0.5,
      s"two comparable hot sites must clear the SUMMED threshold, " +
        s"got ${twoHotPlan.hotSetShare}")
    assert(twoHotPlan.bucketedAsofSeconds === Some(21600L))
    assert(twoHotPlan.bucketedLevel1Seconds === Some(21600L))
    val twoHotRef = LevelPipeline.processLevels(
      twoHot, stations5, silo5, inten5)
      .collect().map(_.toString).sorted.toSeq
    val twoHotAuto = LevelPipeline.processLevels(
      twoHot, stations5, silo5, inten5, autoSkew = true)
      .collect().map(_.toString).sorted.toSeq
    assert(twoHotAuto === twoHotRef,
      "the multi-hot-engaged hatches may change the plan, never the answer")
  }

  test("processLevelsProfiled: first run pays ONE dedicated scan, steady " +
    "state pays zero, the refresh fires ON SCHEDULE (every Nth run via " +
    "the persisted runsSinceRefresh counter, not every run), answers " +
    "unchanged; a moved hot key degrades to unknown-share and " +
    "re-measures once") {
    import org.apache.spark.sql.functions.{col => C}
    import graft.operators.SkewOps
    val dir = "/root/testdata/sf0.001"
    val raw5 = graft.queries.PipelineQueries.rawDf(spark, dir)
    val stations5 = graft.queries.PipelineQueries.stationsDf(spark)
    val silo5 = graft.queries.PipelineQueries.siloDf(spark)
    val inten5 = graft.queries.PipelineQueries.intensityDf(spark)
    val hot = raw5.unionByName(
      raw5.filter(C("site_no") === 0).crossJoin(
        spark.range(4).select(C("id").as("__r")))
        .withColumn("time",
          expr("time + make_interval(0, 0, 0, 0, 0, 0, __r + 1)"))
        .drop("__r"))
    val profDir = tempDirFile("graft_skewprof_").getAbsolutePath + "/p"
    val reference = LevelPipeline.processLevels(hot, stations5, silo5, inten5,
      autoSkew = true).collect().map(_.toString).sorted.toSeq
    def observes(r: LevelPipeline.ProfiledLevels): Boolean =
      r.df.queryExecution.analyzed.treeString.contains("CollectMetrics")
    def counter(): Int = SkewOps.readProfile(spark, profDir).get.runsSinceRefresh

    // run 1: no profile -> one dedicated scan (exact measurement),
    // hatches engaged; with the default cadence (N = 4) the observation
    // is NOT attached — the fresh measurement starts the counter
    val before = SkewOps.dedicatedProfileJobs.get()
    val run1 = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir)
    assert(SkewOps.dedicatedProfileJobs.get() === before + 1)
    assert(run1.plan.bucketedAsofSeconds === Some(21600L))
    assert(run1.plan.bucketedLevel1Seconds === Some(21600L))
    assert(!observes(run1),
      "an off-cadence run must not carry the CollectMetrics barrier")
    val rows1 = run1.df.collect().map(_.toString).sorted.toSeq
    assert(rows1 === reference,
      "profiled chain must be row-identical to processLevels(autoSkew)")
    assert(run1.refresh().isEmpty, "off-cadence refresh is a no-op")
    assert(counter() === 1)
    val stored1 = SkewOps.readProfile(spark, profDir).get
    assert(stored1.hotKey === Seq("0") && stored1.share >= 0.5,
      "the dedicated scan's exact measurement must be what persists")

    // runs 2 and 3: ZERO dedicated scans, ZERO observations — the
    // counter ladder climbs via sidecar writes alone
    for (expected <- Seq(2, 3)) {
      val run = LevelPipeline.processLevelsProfiled(
        hot, stations5, silo5, inten5, profDir)
      assert(SkewOps.dedicatedProfileJobs.get() === before + 1,
        "steady-state profiled run must not pay a dedicated profile scan")
      assert(run.plan.bucketedAsofSeconds === Some(21600L))
      assert(!observes(run))
      assert(run.refresh().isEmpty)
      assert(counter() === expected)
    }

    // run 4: counter + 1 reaches N -> the observation rides this run,
    // refresh lands the exact share and RESETS the counter
    val run4 = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir)
    assert(SkewOps.dedicatedProfileJobs.get() === before + 1)
    assert(observes(run4), "the Nth run must attach the observation")
    assert(run4.df.collect().map(_.toString).sorted.toSeq === reference)
    val refreshed4 = run4.refresh()
    assert(refreshed4.isDefined)
    assert(refreshed4.get.hotKey === Seq("0"))
    assert(refreshed4.get.share >= 0.5,
      s"refresh must land the exact hot share, got ${refreshed4.get.share}")
    assert(counter() === 0, "a completed refresh resets the cadence counter")

    // refreshEveryN = 1 pins the pre-r17 behavior: observe every run
    val every = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir, refreshEveryN = 1)
    assert(observes(every))
    every.df.count()
    assert(every.refresh().exists(_.share >= 0.5))

    // hot key moves: seed a stale profile claiming site 3 is hot, with
    // the counter one short of the schedule so THIS run observes. The
    // run plans from the stale share (still engaged), the refresh sees
    // mode != stored hot -> share -1 (unknown), and the NEXT run pays
    // exactly one dedicated scan to re-measure
    SkewOps.writeProfile(spark, profDir,
      SkewOps.SkewProfile(Seq("site_no"), Seq("3"), 0.9, 1L,
        runsSinceRefresh = 3))
    val run5 = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir)
    assert(SkewOps.dedicatedProfileJobs.get() === before + 1)
    assert(observes(run5))
    run5.df.count()
    val refreshed5 = run5.refresh()
    assert(refreshed5.exists(p => p.share === -1.0 && p.hotKey === Seq("0")),
      s"moved hot key must degrade to unknown share, got $refreshed5")
    val run6 = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir)
    assert(SkewOps.dedicatedProfileJobs.get() === before + 2,
      "the run after an unknown-share profile re-measures once")
    assert(run6.plan.bucketedAsofSeconds === Some(21600L))
    run6.df.count()
    run6.refresh()

    // master switch off: no observation, no counter churn, no-op refresh
    val preCounter = counter()
    val run7 = LevelPipeline.processLevelsProfiled(
      hot, stations5, silo5, inten5, profDir, observeRefresh = false)
    assert(SkewOps.dedicatedProfileJobs.get() === before + 2)
    assert(!observes(run7))
    assert(run7.plan.bucketedAsofSeconds === Some(21600L))
    assert(run7.df.collect().map(_.toString).sorted.toSeq === reference)
    assert(run7.refresh().isEmpty, "norefresh mode must be a no-op refresh")
    assert(counter() === preCounter,
      "observeRefresh = false must not advance the cadence counter")
  }
}
