package graft

import org.apache.spark.sql.SparkSession

/** VERDICT r15 item 4's timing note: the driver-side merge loop vs the
  * pre-r16 one-Spark-job-per-round trainer, on the same corpus. The
  * per-round form pays a fixed stage latency PER MERGE (the structural
  * reason production 32k-merge training was impossible); the driver
  * loop pays one distributed word-table scan and then metadata-scale
  * work per round. Reported: per-round trainer at its old costs for a
  * modest rank budget, the driver loop at that same budget AND at a
  * production-scale budget the old cap could never reach.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val jobMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_JOB_MERGES", "200").toInt
    val bigMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_BIG_MERGES", "32000").toInt
    // The recorded r17 residual boundary (SCALE.md): 32k-merge training
    // over a ~10M-word floor-filtered vocabulary — the per-merge site
    // scan includes stale inverted-index entries, and whether that term
    // matters was never measured at the scale the knob targets.
    // SPARK_GRAFT_BPE_BOUNDARY=1 runs ONLY that probe: a synthetic
    // vocabulary of `SPARK_GRAFT_BPE_WORDS` distinct md5 words (each
    // appearing twice so a minCount=2 floor is actually exercised) and
    // the driver loop at `SPARK_GRAFT_BPE_MERGES`, reporting trained
    // merges + wall so a rate can be quoted even if the budget runs the
    // vocabulary dry.
    val boundary = sys.env.get("SPARK_GRAFT_BPE_BOUNDARY").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    import graft.operators.TextOps
    // SPARK_GRAFT_BPE_SHARDED=1: the escape-hatch probe (VERDICT r19
    // item 1). Same synthetic vocabulary shape as the boundary probe,
    // but trained with bpeTrainSharded — the word table stays on the
    // executors and the driver holds only the pair-count map, so the
    // run must SUCCEED on a driver the in-operator heap guard refuses
    // the collected loop on (the artifact records both facts from the
    // same JVM). Default budget 500 merges: the probe prices the
    // per-round job cost (merges_per_sec quotes the 32k extrapolation);
    // the full production budget is hours of sequential jobs by design.
    if (sys.env.get("SPARK_GRAFT_BPE_SHARDED").contains("1")) {
      val words = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "10000000").toLong
      val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "500").toInt
      val synth = spark.range(words * 2)
        .selectExpr(s"md5(cast(id % $words as string)) as text")
      TextOps.bpeTrainSharded(spark.range(1000L)
        .selectExpr("md5(cast(id as string)) as text"), "text", 5) // warm-up
      // the guard's verdict on the DRIVER loop for this vocabulary at
      // this -Xmx, recorded from the operator itself (on a driver big
      // enough to pass, this trains and times the loop instead — also
      // a valid datapoint)
      val (refused, driverSec) =
        try { val (_, t) = timed(TextOps.bpeTrain(synth, "text", merges,
          minCount = 2L)); (false, t) }
        catch { case _: IllegalArgumentException => (true, -1.0) }
      val (m, t) = timed(TextOps.bpeTrainSharded(synth, "text", merges,
        minCount = 2L))
      val gb = Runtime.getRuntime.maxMemory / 1e9
      println(s"""{"metric":"bpe_sharded","unit":"sec","cpus":$cpus,"vocab_words":$words,"merge_budget":$merges,"merges_trained":${m.size},"sharded_sec":$t,"merges_per_sec":${if (t > 0) m.size / t else -1.0},"driver_loop_guard_refused":$refused,"driver_loop_sec":$driverSec,"max_heap_gb":$gb}""")
      spark.stop()
      return
    }
    if (boundary) {
      val words = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "10000000").toLong
      val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "32000").toInt
      val synth = spark.range(words * 2)
        .selectExpr(s"md5(cast(id % $words as string)) as text")
      TextOps.bpeTrain(spark.range(1000L)
        .selectExpr("md5(cast(id as string)) as text"), "text", 5) // warm-up
      // heapGuard off: the boundary probe EXISTS to measure the very
      // footprint the guard refuses (the operator of record keeps it on)
      val (m, t) = timed(TextOps.bpeTrain(synth, "text", merges,
        minCount = 2L, heapGuard = false))
      println(s"""{"metric":"bpe_boundary","unit":"sec","cpus":$cpus,"vocab_words":$words,"merge_budget":$merges,"merges_trained":${m.size},"driver_loop_sec":$t,"merges_per_sec":${if (t > 0) m.size / t else -1.0}}""")
      spark.stop()
      return
    }
    val docs = Tables(spark, sfDir, "documents")
    // warm-up: JVM/codegen/scan
    TextOps.bpeTrain(docs, "text", 5)
    val (mJobs, tJobs) =
      timed(TextOps.bpeTrainPerRoundJobs(docs, "text", jobMerges))
    val (mDrv, tDrv) = timed(TextOps.bpeTrain(docs, "text", jobMerges))
    require(mJobs == mDrv, "trainers diverged — BpeSpec should have caught this")
    val (mBig, tBig) = timed(TextOps.bpeTrain(docs, "text", bigMerges))
    // the sf corpus is word-salad over a tiny vocabulary (it runs dry
    // after ~90 merges), so the production-budget datapoint needs a
    // synthetic vocabulary with real pair structure: 200k distinct
    // md5-hex words (16-char alphabet -> deep merge chains), one scan
    // to the word table, then the driver loop at a 2k-merge budget
    val synth = spark.range(200000L)
      .selectExpr("md5(cast(id as string)) as text")
    val (mSynth, tSynth) = timed(TextOps.bpeTrain(synth, "text", 2000))
    println(s"""{"metric":"bpe_timing","unit":"sec","sf":"$sfDir","cpus":$cpus,"job_merges":$jobMerges,"per_round_jobs":$tJobs,"driver_loop_same_budget":$tDrv,"big_merges":$bigMerges,"big_merges_trained":${mBig.size},"driver_loop_big":$tBig,"synth_vocab":200000,"synth_merges":2000,"synth_trained":${mSynth.size},"driver_loop_synth":$tSynth}""")
    spark.stop()
  }
}
