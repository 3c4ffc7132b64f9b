package graft

class PipelineCliSpec extends SparkSpec {

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("parse: reference semantics (-d xor -t, typed errors)") {
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "31"))
      .exists(_.backprocessDays === Some(31)))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o",
      "-t", "2024-01-01T00:00:00")).exists(_.fromDatetime === Some(T("2024-01-01 00:00:00"))))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o",
      "-d", "5", "-t", "2024-01-01T00:00:00"))
      .left.exists(_.contains("Cannot use -d and -t")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "x"))
      .left.exists(_.contains("-d must be an integer")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "-d", "-3"))
      .left.exists(_.contains("negative")))
    assert(PipelineCli.parse(Seq("--output", "o"))
      .left.exists(_.contains("required")))
    assert(PipelineCli.parse(Seq("--input", "i", "--output", "o", "--bogus"))
      .left.exists(_.contains("unknown argument")))
  }

  test("resolveBackprocessDays: default 365, -t derives from now") {
    val now = T("2024-02-01 00:00:00")
    assert(PipelineCli.resolveBackprocessDays(
      PipelineCli.Config(input = "i", output = "o"), now) === Right(365))
    assert(PipelineCli.resolveBackprocessDays(
      PipelineCli.Config(input = "i", output = "o",
        fromDatetime = Some(T("2024-01-01 00:00:00"))), now) === Right(32))
  }

  test("parse: nmdb-catchup mode requires --feed, validates lookback") {
    assert(PipelineCli.parse(Seq("--mode", "nmdb-catchup", "--input", "i",
      "--output", "o", "--feed", "f")).exists(c =>
      c.mode == "nmdb-catchup" && c.feed == "f" && c.maxLookbackHours == 24))
    assert(PipelineCli.parse(Seq("--mode", "nmdb-catchup", "--input", "i",
      "--output", "o")).left.exists(_.contains("--feed is required")))
    assert(PipelineCli.parse(Seq("--mode", "bogus", "--input", "i",
      "--output", "o")).left.exists(_.contains("--mode must be")))
    assert(PipelineCli.parse(Seq("--mode", "nmdb-catchup", "--input", "i",
      "--output", "o", "--feed", "f", "--max-lookback-hours", "0"))
      .left.exists(_.contains("positive")))
  }

  test("nmdb-catchup mode: resumes, validates, appends to the store") {
    import spark.implicits._
    val d = tempDirFile("graft_cli_nmdb_")
    d.deleteOnExit()
    val in = d.getAbsolutePath + "/in"
    val out = d.getAbsolutePath + "/out"
    val feedPath = d.getAbsolutePath + "/feed"
    // store: site 1 up to 10:00; raw: irrelevant here but must exist
    Seq((1, T("2024-01-05 09:00:00"), 100.0, 0),
      (1, T("2024-01-05 10:00:00"), 101.0, 0))
      .toDF("site_no", "time", "intensity", "bad_data_flag")
      .write.parquet(s"$in/intensity")
    Seq((1, T("2024-01-05 00:00:00"), 1.0))
      .toDF("site_no", "time", "v").write.parquet(s"$in/raw_values")
    // feed: hours 10..13 present, 12:00 spikes 2x (flagged), 14:00 missing
    Seq((1, T("2024-01-05 10:00:00"), 101.0),
      (1, T("2024-01-05 11:00:00"), 102.0),
      (1, T("2024-01-05 12:00:00"), 210.0),
      (1, T("2024-01-05 13:00:00"), 103.0))
      .toDF("site_no", "time", "intensity").write.parquet(feedPath)
    PipelineCli.runNmdbCatchup(spark, PipelineCli.Config(
      input = in, output = out, mode = "nmdb-catchup", feed = feedPath,
      now = Some(T("2024-01-05 15:30:00"))))
    val got = graft.operators.IncrementalRunner.readLevel(spark, out)
      .select("time", "intensity", "bad_data_flag")
      .as[(java.sql.Timestamp, Double, Int)].collect().sortBy(_._1.getTime)
    // walk = 10:00..15:00 inclusive, stops at missing 14:00 -> 10..13
    assert(got.map(_._1) === Seq(T("2024-01-05 10:00:00"),
      T("2024-01-05 11:00:00"), T("2024-01-05 12:00:00"),
      T("2024-01-05 13:00:00")).toArray)
    // the 2x spike is flagged and does not poison the chain
    assert(got.map(r => (r._2, r._3)) ===
      Array((101.0, 0), (102.0, 0), (210.0, 1), (103.0, 0)))
  }

  test("nmdb-catchup run twice: earlier same-day hours survive the append") {
    import spark.implicits._
    val d = tempDirFile("graft_cli_nmdb2_")
    d.deleteOnExit()
    val in1 = d.getAbsolutePath + "/in1"
    val in2 = d.getAbsolutePath + "/in2"
    val out = d.getAbsolutePath + "/out"
    val feed1 = d.getAbsolutePath + "/feed1"
    val feed2 = d.getAbsolutePath + "/feed2"
    Seq((1, T("2024-01-05 09:00:00"), 100.0, 0),
      (1, T("2024-01-05 10:00:00"), 101.0, 0))
      .toDF("site_no", "time", "intensity", "bad_data_flag")
      .write.parquet(s"$in1/intensity")
    Seq((1, T("2024-01-05 00:00:00"), 1.0))
      .toDF("site_no", "time", "v").write.parquet(s"$in1/raw_values")
    Seq((1, T("2024-01-05 10:00:00"), 101.0),
      (1, T("2024-01-05 11:00:00"), 102.0),
      (1, T("2024-01-05 12:00:00"), 103.0),
      (1, T("2024-01-05 13:00:00"), 104.0))
      .toDF("site_no", "time", "intensity").write.parquet(feed1)
    PipelineCli.runNmdbCatchup(spark, PipelineCli.Config(
      input = in1, output = out, mode = "nmdb-catchup", feed = feed1,
      now = Some(T("2024-01-05 15:30:00"))))
    // second run resumes FROM THE STORE the first run wrote (13:00), so its
    // append holds only hours >= 13:00 of a day that already has 10..12
    graft.operators.IncrementalRunner.readLevel(spark, out)
      .write.parquet(s"$in2/intensity")
    Seq((1, T("2024-01-05 00:00:00"), 1.0))
      .toDF("site_no", "time", "v").write.parquet(s"$in2/raw_values")
    Seq((1, T("2024-01-05 13:00:00"), 104.0),
      (1, T("2024-01-05 14:00:00"), 105.0),
      (1, T("2024-01-05 15:00:00"), 106.0))
      .toDF("site_no", "time", "intensity").write.parquet(feed2)
    PipelineCli.runNmdbCatchup(spark, PipelineCli.Config(
      input = in2, output = out, mode = "nmdb-catchup", feed = feed2,
      now = Some(T("2024-01-05 17:30:00"))))
    val got = graft.operators.IncrementalRunner.readLevel(spark, out)
      .select("time", "intensity", "bad_data_flag")
      .as[(java.sql.Timestamp, Double, Int)].collect().sortBy(_._1.getTime)
    // hours 10..12 from run 1 MUST survive run 2's partial-day append
    assert(got.map(_._1) === (10 to 15).map(h =>
      T(f"2024-01-05 $h%02d:00:00")).toArray)
    assert(got.map(_._2) === Array(101.0, 102.0, 103.0, 104.0, 105.0, 106.0))
    assert(got.forall(_._3 == 0))
  }

  test("parse: curate mode flags (--benchmark, --min-quality bounds, " +
    "--sep non-empty)") {
    assert(PipelineCli.parse(Seq("--mode", "curate", "--input", "i",
      "--output", "o", "--benchmark", "b", "--min-quality", "0.5",
      "--sep", "|")).exists(c =>
      c.mode == "curate" && c.benchmark == Some("b") &&
        c.minQuality == 0.5 && c.sep == "|"))
    assert(PipelineCli.parse(Seq("--mode", "curate", "--input", "i",
      "--output", "o", "--min-quality", "1.5"))
      .left.exists(_.contains("min-quality")))
    assert(PipelineCli.parse(Seq("--mode", "curate", "--input", "i",
      "--output", "o", "--sep", ""))
      .left.exists(_.contains("non-empty")))
  }

  test("curate mode: decision log covers every input doc, gates compose, " +
    "curated output carries deduped text") {
    import spark.implicits._
    val d = tempDirFile("graft_cur_")
    d.deleteOnExit()
    val in = d.getAbsolutePath + "/in"
    val out = d.getAbsolutePath + "/out"
    Seq(
      (1L, "alpha beta gamma delta"),       // clean, unique -> kept
      (2L, "alpha beta gamma delta"),       // exact dup of 1 -> dropped
      (3L, "a a a a a"),                    // degenerate -> fails quality
      (4L, "foo bar\nfoo bar\nbaz qux"),    // internal repeat -> dedups, kept
      (5L, "evalmark secret tokens here words")) // hits the benchmark
      .toDF("doc_id", "text")
      .write.parquet(s"$in/documents")
    val bench = d.getAbsolutePath + "/bench"
    Seq((100L, "evalmark secret tokens overlap"))
      .toDF("doc_id", "text").write.parquet(bench)

    PipelineCli.run(spark, PipelineCli.Config(
      input = in, output = out, mode = "curate",
      benchmark = Some(bench), sep = "\n"))

    val dec = spark.read.parquet(s"$out/decisions")
      .select($"doc_id", $"passed_quality", $"is_exact_dup",
        $"is_contaminated", $"keep", $"text_dedup")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(dec.size === 5) // one decision row PER input doc
    assert(dec(1L)._5 === true)
    assert(dec(2L)._3 === true && dec(2L)._5 === false) // dup of 1
    assert(dec(3L)._2 === false && dec(3L)._5 === false) // quality gate
    assert(dec(4L)._5 === true &&
      dec(4L)._6 === "foo bar\nbaz qux") // internal repeat removed
    assert(dec(5L)._4 === true && dec(5L)._5 === false) // decontaminated

    val curated = spark.read.parquet(s"$out/curated")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(curated === Seq(
      (1L, "alpha beta gamma delta"), (4L, "foo bar\nbaz qux")))

    // re-run is idempotent (overwrite semantics)
    PipelineCli.run(spark, PipelineCli.Config(
      input = in, output = out, mode = "curate",
      benchmark = Some(bench), sep = "\n"))
    assert(spark.read.parquet(s"$out/curated").count() === 2)
  }

  test("parse: compact mode needs only --input, validates " +
    "--target-file-bytes") {
    val ok = PipelineCli.parse(Seq(
      "--mode", "compact", "--input", "/x/t",
      "--target-file-bytes", "1048576"))
    assert(ok === Right(PipelineCli.Config(
      input = "/x/t", mode = "compact", targetFileBytes = 1048576L)))
    assert(PipelineCli.parse(Seq("--mode", "compact")).isLeft)
    assert(PipelineCli.parse(Seq(
      "--mode", "compact", "--input", "/x/t",
      "--target-file-bytes", "0")).isLeft)
    assert(PipelineCli.parse(Seq(
      "--mode", "compact", "--input", "/x/t",
      "--target-file-bytes", "lots")).isLeft)
  }

  test("compact mode: advisor-driven rewrite collapses a small-file " +
    "table, a second run is a no-op, rows survive") {
    val dir = tempDirFile("graft_clicompact_").getAbsolutePath + "/t"
    spark.range(0, 5000).toDF("id").repartition(16).write.parquet(dir)
    def files(): Seq[String] = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    assert(files().size === 16)
    PipelineCli.run(spark, PipelineCli.Config(
      input = dir, mode = "compact", targetFileBytes = 1L << 30))
    assert(files().size === 1, "16 small files must collapse to 1")
    assert(spark.read.parquet(dir).count() === 5000)
    val once = files()
    PipelineCli.run(spark, PipelineCli.Config(
      input = dir, mode = "compact", targetFileBytes = 1L << 30))
    assert(files() === once,
      "a healthy table must not be rewritten (same inodes survive)")
  }
}
