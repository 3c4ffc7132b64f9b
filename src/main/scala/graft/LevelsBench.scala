package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The VERDICT r13 item-2 spike bench: the full raw→level4 chain
  * ([[graft.operators.LevelPipeline.processLevels]]) volume-scaled the
  * same way AsofBench scaled J4 — raw multiplied
  * `SPARK_GRAFT_LEVELS_MULT`× (default 200), replicas offset by seconds
  * AND perturbed on one sensor field so the 29-min dedup does not
  * collapse them back — under (a) the production 5-site distribution and
  * (b) a pathological hot-site fixture (~60% of all rows on site 0: 50%
  * hash-reassigned plus site 0's own fifth of the rest).
  *
  * Each fixture runs the chain twice: the default union+window as-of
  * (J4) and the j11 bucketed hatch
  * ([[graft.operators.AsofStrategies.asOfLookupBucketed]] threaded via
  * `processLevels(bucketedAsofSeconds)`). The level1 dedup stage (J6)
  * is also timed alone on the hot fixture — the site_no window
  * partitioning serializes THERE first, before J4 ever runs, which is
  * what decides whether the hatch alone can rescue a hot-site chain.
  * The a18 skewProfile signal (top-key share/skew on the hot fixture)
  * is embedded in the output line so the SCALE.md decision rule cites a
  * measured number, not a guess. Two timed passes, warm pass reported
  * first-class, one JSON line — Bench.scala's discipline.
  */
object LevelsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_LEVELS_MULT", "200").toInt
    // measure the PRE-r14 level4 (naive centered RANGE frame,
    // O(n·frame) re-accumulation) instead of the decimal prefix form —
    // the before/after lever for the spike writeup
    val naiveL4 = sys.env.get("SPARK_GRAFT_LEVELS_NAIVE_L4").contains("1")
    val bucketSecs =
      sys.env.getOrElse("SPARK_GRAFT_LEVELS_BUCKET", "21600").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stations = graft.queries.PipelineQueries.stationsDf(spark)
    val silo = graft.queries.PipelineQueries.siloDf(spark)
    val intensity = graft.queries.PipelineQueries.intensityDf(spark)

    // mult× the raw feed: +__rep seconds keeps timestamps distinct, and
    // the internal_temperature nudge keeps replicas OUT of the 29-min
    // equal-sensor dedup (the dedup must stay loaded, not collapse the
    // multiplier away).
    val raw = graft.queries.PipelineQueries.rawDf(spark, sfDir)
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .withColumn("time", expr("timestampadd(SECOND, __rep, time)"))
      .withColumn("internal_temperature",
        $"internal_temperature" + $"__rep" * 0.001)
      .drop("__rep")

    // hot fixture: half of all rows hash-collapse onto site 0 (site 0
    // ends up with ~60% of the stream)
    val hot = raw.withColumn("site_no",
      when(pmod(xxhash64($"time", $"internal_temperature"), lit(2)) === 0,
        lit(0)).otherwise($"site_no"))

    // TWO-comparable-hot-site fixture (VERDICT r18 item 4): 7/20 of all
    // rows hash onto site 0 and another 7/20 onto site 1; the
    // unreassigned 30% keeps its original uniform-5 site, so sites 0/1
    // each end at ~41% — neither clears a 0.5 top-1 threshold alone,
    // both qualify through the share-floor arm (skew ~2x the 5-key
    // mean, over SoloMinSkew), and their ~82% summed share is what
    // SkewOps.engages fires on. This prices the multi-hot hatch
    // decision the r18 round landed with spec pins only.
    val multihot = raw.withColumn("site_no",
      when(pmod(xxhash64($"time", $"internal_temperature"), lit(20)) < 7,
        lit(0))
        .when(pmod(xxhash64($"time", $"internal_temperature"), lit(20)) < 14,
          lit(1))
        .otherwise($"site_no"))

    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    import graft.operators.{LevelPipeline, SkewOps}
    // steady-state profile for hot_profiled: seeded OUTSIDE the timers
    // (the first-run dedicated scan is hot_auto's cost, already
    // measured); both passes share the path, so pass1's refresh feeds
    // pass2 — the scheduled-ingest loop exactly
    val profDir = java.nio.file.Files.createTempDirectory("levels_prof")
      .toString + "/p"
    val allCases: Seq[(String, () => Unit)] = Seq(
      "uniform_union" -> (() =>
        force(LevelPipeline.processLevels(raw, stations, silo, intensity,
          naiveLevel4Frame = naiveL4))),
      "uniform_bucketed" -> (() =>
        force(LevelPipeline.processLevels(raw, stations, silo, intensity,
          bucketedAsofSeconds = Some(bucketSecs),
          naiveLevel4Frame = naiveL4))),
      // BOTH hatches on the uniform fixture: the downside measurement
      // for the r15 bucketed level1 (is the hatch free when not needed?)
      "uniform_full_bucketed" -> (() =>
        force(LevelPipeline.processLevels(raw, stations, silo, intensity,
          bucketedAsofSeconds = Some(bucketSecs),
          naiveLevel4Frame = naiveL4,
          bucketedLevel1Seconds = Some(bucketSecs)))),
      "hot_union" -> (() =>
        force(LevelPipeline.processLevels(hot, stations, silo, intensity,
          naiveLevel4Frame = naiveL4))),
      "hot_bucketed" -> (() =>
        force(LevelPipeline.processLevels(hot, stations, silo, intensity,
          bucketedAsofSeconds = Some(bucketSecs),
          naiveLevel4Frame = naiveL4))),
      // the r15 headline: bucketed as-of AND bucketed level1 lag/dedup —
      // what processLevels(autoSkew = true) selects at share >= 0.5
      "hot_full_bucketed" -> (() =>
        force(LevelPipeline.processLevels(hot, stations, silo, intensity,
          bucketedAsofSeconds = Some(bucketSecs),
          naiveLevel4Frame = naiveL4,
          bucketedLevel1Seconds = Some(bucketSecs)))),
      // the pre-r16 auto mode: DEDICATED profile scan + decide + run,
      // all timed together (the ~17 s overhead r15 measured)
      "hot_auto" -> (() =>
        force(LevelPipeline.processLevels(hot, stations, silo, intensity,
          naiveLevel4Frame = naiveL4, autoSkew = true,
          autoSkewBucketSeconds = bucketSecs))),
      // the r17 DEFAULT: decision from last run's profile, refresh only
      // every refreshEveryN-th run (persisted counter — most scheduled
      // runs carry NO observation barrier, so this should track
      // hot_profiled_norefresh; the ladder of counter values across the
      // warm-up + two passes exercises both shapes)
      "hot_profiled" -> (() => {
        val r = LevelPipeline.processLevelsProfiled(
          hot, stations, silo, intensity, profDir,
          naiveLevel4Frame = naiveL4, bucketSeconds = bucketSecs)
        force(r.df)
        r.refresh()
        ()
      }),
      // the pre-r17 every-run shape: observation + refresh INSIDE the
      // timer every time — prices the CollectMetrics barrier the
      // cadence exists to amortize (VERDICT r16 item 2)
      "hot_profiled_everyrun" -> (() => {
        val r = LevelPipeline.processLevelsProfiled(
          hot, stations, silo, intensity, profDir,
          naiveLevel4Frame = naiveL4, bucketSeconds = bucketSecs,
          refreshEveryN = 1)
        force(r.df)
        r.refresh()
        ()
      }),
      // the refresh-cadence steady state: plan from the profile, no
      // observation attached — must be ~= hot_full_bucketed exactly
      "hot_profiled_norefresh" -> (() => {
        val r = LevelPipeline.processLevelsProfiled(
          hot, stations, silo, intensity, profDir,
          naiveLevel4Frame = naiveL4, bucketSeconds = bucketSecs,
          observeRefresh = false)
        force(r.df)
        ()
      }),
      "hot_l1_dedup_only" -> (() => force(LevelPipeline.level1(hot))),
      "hot_l1_bucketed_only" -> (() =>
        force(LevelPipeline.level1(hot, bucketSeconds = Some(bucketSecs)))),
      // the multi-hot pricing triplet: hatch-off, hatch-on (what the
      // summed arm selects), and the live planSkew decision — engaging
      // through the summed share, since no single site clears 0.5
      "multihot_union" -> (() =>
        force(LevelPipeline.processLevels(multihot, stations, silo,
          intensity, naiveLevel4Frame = naiveL4))),
      "multihot_full_bucketed" -> (() =>
        force(LevelPipeline.processLevels(multihot, stations, silo,
          intensity, bucketedAsofSeconds = Some(bucketSecs),
          naiveLevel4Frame = naiveL4,
          bucketedLevel1Seconds = Some(bucketSecs)))),
      "multihot_auto" -> (() =>
        force(LevelPipeline.processLevels(multihot, stations, silo,
          intensity, naiveLevel4Frame = naiveL4, autoSkew = true,
          autoSkewBucketSeconds = bucketSecs))))

    // case subset for forked per-JVM runs at the heaviest mults (the
    // TextSpike discipline); empty selections and unknown names fail
    // loudly (ADVICE r18) — shared parser, see HarnessEnv
    val cases = HarnessEnv.selectCases("SPARK_GRAFT_LEVELS_CASES", allCases)
    def selected(prefix: String): Boolean =
      cases.exists(_._1.startsWith(prefix))
    // fixture-scale signals and the profile seed cost a dedicated scan
    // each — pay them only for fixtures a selected case actually runs
    if (selected("hot_profiled"))
      SkewOps.writeProfile(spark, profDir,
        SkewOps.hotKeyProfile(hot, Seq("site_no")))

    // the a18 signal on the hot fixture's shuffle key
    val prof =
      if (selected("hot")) graft.operators.SkewOps
        .skewProfile(hot.select($"site_no"), Seq("site_no"), topK = 1)
        .select($"share", $"skew").as[(Double, Double)].head()
      else (-1.0, -1.0)
    // the multi-hot fixture's decision signals: top-1 share (must sit
    // under 0.5) and the skew-qualified summed share (what engages)
    val mprof =
      if (selected("multihot")) {
        val p = SkewOps.hotKeyProfile(multihot, Seq("site_no"))
        (p.share, p.hotSetShare)
      } else (-1.0, -1.0)

    try cases.head._2() catch { case _: Throwable => () } // warm-up
    def pass(): Seq[(String, Double)] = cases.map { case (name, mk) =>
      val t0 = System.nanoTime()
      val ok = try { mk(); true } catch { case e: Throwable =>
        System.err.println(s"[levels-bench] $name FAILED: ${e.getMessage}")
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = pass()
    val p2 = pass()
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"levels_spike","unit":"sec","sf":"$sfDir","mult":$mult,"bucket_seconds":$bucketSecs,"cpus":$cpus,"naive_l4":$naiveL4,"hot_top_share":${prof._1},"hot_top_skew":${prof._2},"multihot_top_share":${mprof._1},"multihot_hotset_share":${mprof._2},"pass2":${fmt(p2)},"pass1":${fmt(p1)}}""")
    spark.stop()
  }
}
