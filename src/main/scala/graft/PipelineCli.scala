package graft

import graft.operators.{IncrementalRunner, LevelPipeline, NmdbCatchup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI runner mirroring the reference's two cron entry points.
  *
  * Levels (`pipeline/cosmoz_process_levels.py:677-716`, via
  * `process_levels.sh`):
  * {{{
  * runMain graft.PipelineCli --input <dir> --output <dir>
  *   [-s SITE] [-d DAYS | -t ISO_DATETIME] [--now ISO_DATETIME]
  *   [--emulate-old-version] [--pad-seconds N]
  * }}}
  *
  * NMDB intensity catch-up (`nmdb/entrypoint.py:68-99`, via
  * `get_nmdb_intensities.sh`, cron 2x/day):
  * {{{
  * runMain graft.PipelineCli --mode nmdb-catchup --input <dir>
  *   --feed <parquet> --output <dir> [--now ISO] [--max-lookback-hours N]
  * }}}
  * `--feed` is the hourly intensity source table (the stand-in for the
  * NMDB NEST HTTP endpoint — in production a fetcher lands those rows;
  * parsing is S5). Resume/clamp/gap-stop/validation per [[NmdbCatchup]].
  *
  * `<input dir>` must hold raw_values/ silo_data/ intensity/ stations/
  * parquet tables (SURVEY §1.2 schemas). `-d` and `-t` are mutually
  * exclusive; default backprocess is 365 days (the reference's ONE_YEAR).
  * The reference's `-xx` drop-old is implicit: the day-bucketed dynamic
  * partition overwrite only ever replaces recomputed partitions.
  */
object PipelineCli {

  final case class Config(
      input: String = "",
      output: String = "",
      mode: String = "levels",
      feed: String = "",
      maxLookbackHours: Int = NmdbCatchup.DefaultMaxLookbackHours,
      site: Option[Int] = None,
      backprocessDays: Option[Int] = None,
      fromDatetime: Option[java.sql.Timestamp] = None,
      now: Option[java.sql.Timestamp] = None,
      emulateOldVersion: Boolean = false,
      padSeconds: Long = 6 * 3600)

  /** Pure argument parser (reference semantics: -d xor -t, ints checked,
    * negative windows rejected). Returns Left(error) on bad usage.
    */
  def parse(args: Seq[String]): Either[String, Config] = {
    def loop(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case "--input" :: v :: t => loop(t, c.copy(input = v))
      case "--output" :: v :: t => loop(t, c.copy(output = v))
      case ("-s" | "--site-number") :: v :: t =>
        v.toIntOption.toRight(s"-s must be an integer, got '$v'")
          .flatMap(i => loop(t, c.copy(site = Some(i))))
      case ("-d" | "--process-days") :: v :: t =>
        v.toIntOption.toRight(s"-d must be an integer, got '$v'")
          .flatMap(d => loop(t, c.copy(backprocessDays = Some(d))))
      case ("-t" | "--from-datetime") :: v :: t =>
        scala.util.Try(java.sql.Timestamp.valueOf(v.replace("T", " ")))
          .toOption.toRight(s"-t must be an ISO datetime, got '$v'")
          .flatMap(ts => loop(t, c.copy(fromDatetime = Some(ts))))
      case "--now" :: v :: t =>
        scala.util.Try(java.sql.Timestamp.valueOf(v.replace("T", " ")))
          .toOption.toRight(s"--now must be an ISO datetime, got '$v'")
          .flatMap(ts => loop(t, c.copy(now = Some(ts))))
      case "--emulate-old-version" :: t =>
        loop(t, c.copy(emulateOldVersion = true))
      case "--pad-seconds" :: v :: t =>
        v.toLongOption.toRight(s"--pad-seconds must be an integer, got '$v'")
          .flatMap(p => loop(t, c.copy(padSeconds = p)))
      case "--mode" :: v :: t =>
        if (v == "levels" || v == "nmdb-catchup") loop(t, c.copy(mode = v))
        else Left(s"--mode must be levels or nmdb-catchup, got '$v'")
      case "--feed" :: v :: t => loop(t, c.copy(feed = v))
      case "--max-lookback-hours" :: v :: t =>
        v.toIntOption.filter(_ > 0)
          .toRight(s"--max-lookback-hours must be a positive integer, got '$v'")
          .flatMap(h => loop(t, c.copy(maxLookbackHours = h)))
      case other :: _ => Left(s"unknown argument '$other'")
    }
    loop(args.toList, Config()).flatMap { c =>
      if (c.input.isEmpty || c.output.isEmpty)
        Left("--input and --output are required")
      else if (c.mode == "nmdb-catchup" && c.feed.isEmpty)
        Left("--feed is required in nmdb-catchup mode")
      else if (c.backprocessDays.isDefined && c.fromDatetime.isDefined)
        Left("Cannot use -d and -t at the same time. Pick one.")
      else if (c.backprocessDays.exists(_ < 0))
        Left("Cannot backprocess negative time. Ensure it is positive.")
      else Right(c)
    }
  }

  /** Resolved backprocess window in days (reference default: 365). */
  def resolveBackprocessDays(c: Config, now: java.sql.Timestamp): Either[String, Int] =
    (c.backprocessDays, c.fromDatetime) match {
      case (Some(d), _) => Right(d)
      case (_, Some(from)) =>
        val days = ((now.getTime - from.getTime) / 86400000L).toInt + 1
        if (days < 0) Left("Cannot backprocess negative time.") else Right(days)
      case _ => Right(365)
    }

  def main(args: Array[String]): Unit = {
    parse(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        sys.exit(2)
      case Right(c) =>
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
        val spark = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.extensions", "graft.GraftExtensions")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try run(spark, c)
        finally spark.stop()
    }
  }

  def run(spark: SparkSession, c: Config): Unit =
    if (c.mode == "nmdb-catchup") runNmdbCatchup(spark, c)
    else runLevels(spark, c)

  /** The reference's resume-from-last-stored walk, fleet-wide: plan the
    * missing hours per site, execute against the feed table with
    * gap-stop + validation, append to the day-partitioned store.
    */
  def runNmdbCatchup(spark: SparkSession, c: Config): Unit = {
    val now = c.now.getOrElse(
      new java.sql.Timestamp(System.currentTimeMillis()))
    def table(name: String) = {
      val df = spark.read.parquet(s"${c.input}/$name")
      c.site.fold(df)(s => df.filter(col("site_no") === s))
    }
    val intensity = table("intensity")
    val raw = table("raw_values")
    val feed = {
      val df = spark.read.parquet(c.feed)
      c.site.fold(df)(s => df.filter(col("site_no") === s))
    }
    val nowHour = date_trunc("hour", lit(now))
    val plan = NmdbCatchup.fetchPlan(intensity, raw, nowHour,
      c.maxLookbackHours)
    val appended = NmdbCatchup.catchupAppend(intensity, feed, plan)
    // Point upsert, NOT partition overwrite: the appended frame holds only
    // hours >= each site's resume point, so a whole-partition replace would
    // delete previously stored earlier hours of the same day (the reference
    // point-upserts, never deletes — nmdb/influx_db.py:76-147).
    IncrementalRunner.upsertByKey(appended, c.output)
    println(s"[nmdb-catchup] appended validated intensity hours " +
      s"(now=$now, lookback=${c.maxLookbackHours}h) to ${c.output}")
  }

  def runLevels(spark: SparkSession, c: Config): Unit = {
    val now = c.now.getOrElse(
      new java.sql.Timestamp(System.currentTimeMillis()))
    val days = resolveBackprocessDays(c, now) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(d) => d
    }
    def table(name: String) = {
      val df = spark.read.parquet(s"${c.input}/$name")
      c.site.fold(df)(s => df.filter(col("site_no") === s))
    }
    val raw = table("raw_values")
    val stations = spark.read.parquet(s"${c.input}/stations")
    val silo = table("silo_data")
    val intensity = table("intensity")
    // emulate-old threads through level2 inside a custom chain
    if (c.emulateOldVersion) {
      val windowStart = lit(now) - expr(s"INTERVAL $days DAYS")
      val padded = raw.filter(
        col("time") > windowStart - expr(s"INTERVAL ${c.padSeconds} SECOND") &&
          col("time") <= lit(now))
      val l1 = LevelPipeline.level1(padded)
      val l2 = LevelPipeline.level2(l1, stations, silo, intensity,
        emulateOldVersion = true)
      val l4 = LevelPipeline.level4(LevelPipeline.level3(l2, stations))
      IncrementalRunner.upsertByDay(
        l4.filter(col("time") > windowStart), c.output)
    } else {
      IncrementalRunner.processLevelsIncremental(
        raw, stations, silo, intensity, c.output, now, days, c.padSeconds)
    }
    println(s"[pipeline] wrote level4 window ($days days back from $now) " +
      s"to ${c.output}")
  }
}
