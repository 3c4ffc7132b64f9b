package graft

import graft.operators.IntensityOps.IntensityPoint
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.RawPoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.timestamp_seconds
import org.apache.spark.sql.streaming.OutputMode

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("validatedIntensityStream flags drift across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[IntensityPoint]
    val q = StreamingOps.validatedIntensityStream(input.toDS())
      .writeStream.format("memory").queryName("val_out")
      .outputMode(OutputMode.Append).start()

    // batch 1: baseline then a +200% spike (invalid)
    input.addData(
      IntensityPoint(1, T("2024-01-01 10:00:00"), 100.0),
      IntensityPoint(1, T("2024-01-01 11:00:00"), 300.0))
    q.processAllAvailable()
    // batch 2: 130 drifts >20% from the last VALID carried across the
    // batch boundary (100, NOT 300) -> invalid; proves cross-batch state.
    // Then 105 (valid vs 100) and 70 (invalid vs 105).
    input.addData(
      IntensityPoint(1, T("2024-01-01 12:00:00"), 130.0),
      IntensityPoint(1, T("2024-01-01 13:00:00"), 105.0),
      IntensityPoint(1, T("2024-01-01 14:00:00"), 70.0))
    q.processAllAvailable()
    val out = spark.table("val_out")
      .as[graft.operators.IntensityOps.ValidatedPoint]
      .collect().map(p => p.time -> p.bad_data_flag).toMap
    q.stop()
    assert(out === Map(
      T("2024-01-01 10:00:00") -> 0,
      T("2024-01-01 11:00:00") -> 1,
      T("2024-01-01 12:00:00") -> 1,
      T("2024-01-01 13:00:00") -> 0,
      T("2024-01-01 14:00:00") -> 1))
  }

  test("validatedIntensityStream: >24h gap bypasses the drift check") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[IntensityPoint]
    val q = StreamingOps.validatedIntensityStream(input.toDS())
      .writeStream.format("memory").queryName("gap_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      IntensityPoint(2, T("2024-01-01 10:00:00"), 100.0),
      IntensityPoint(2, T("2024-01-03 10:00:01"), 300.0)) // gap > 24h
    q.processAllAvailable()
    val out = spark.table("gap_out")
      .as[graft.operators.IntensityOps.ValidatedPoint]
      .collect().map(p => p.time -> p.bad_data_flag).toMap
    q.stop()
    assert(out(T("2024-01-03 10:00:01")) === 0)
  }

  test("dedupStream drops near-dups within 29 min, across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[RawPoint]
    val q = StreamingOps.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      RawPoint(1, T("2024-01-01 10:00:00"), "fpA"),
      RawPoint(1, T("2024-01-01 10:10:00"), "fpA"), // dup in-batch
      RawPoint(1, T("2024-01-01 10:20:00"), "fpB"))
    q.processAllAvailable()
    input.addData(
      RawPoint(1, T("2024-01-01 10:25:00"), "fpA"), // dup vs batch 1 state
      RawPoint(1, T("2024-01-01 11:00:00"), "fpA")) // outside 29 min -> kept
    q.processAllAvailable()
    val out = spark.table("dedup_out").as[RawPoint]
      .collect().map(_.time).toSet
    q.stop()
    assert(out === Set(
      T("2024-01-01 10:00:00"),
      T("2024-01-01 10:20:00"),
      T("2024-01-01 11:00:00")))
  }

  test("file-source streaming e2e: csv readStream -> dedup -> sink") {
    import org.apache.spark.sql.types._
    val dir = tempDirFile("graft_stream_")
    dir.deleteOnExit()
    val srcDir = new java.io.File(dir, "src"); srcDir.mkdirs()
    val schema = StructType(Seq(
      StructField("site_no", IntegerType),
      StructField("time", TimestampType),
      StructField("fingerprint", StringType)))
    // batch file 1, dropped into the source dir before the query starts
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "b1.csv").toPath,
      "1,2024-01-01 10:00:00,fpA\n1,2024-01-01 10:10:00,fpA\n")
    val stream = spark.readStream.schema(schema).csv(srcDir.getAbsolutePath)
      .as[RawPoint]
    val q = StreamingOps.dedupStream(stream)
      .writeStream.format("memory").queryName("file_dedup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    q.processAllAvailable()
    // batch file 2 arrives later: one dup vs carried state, one fresh
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "b2.csv").toPath,
      "1,2024-01-01 10:20:00,fpA\n1,2024-01-01 11:30:00,fpA\n")
    q.processAllAvailable()
    val out = spark.table("file_dedup").as[RawPoint].collect().map(_.time).toSet
    q.stop()
    assert(out === Set(
      T("2024-01-01 10:00:00"),   // first fpA kept
      T("2024-01-01 11:30:00")))  // outside 29 min of any prior fpA
  }

  test("checkpointed restart through ParquetPointUpsertSink: no " +
    "duplicates, no loss") {
    import org.apache.spark.sql.types._
    val dir = tempDirFile("graft_restart_")
    dir.deleteOnExit()
    val srcDir = new java.io.File(dir, "src"); srcDir.mkdirs()
    val out = new java.io.File(dir, "out").getAbsolutePath
    val chk = new java.io.File(dir, "chk").getAbsolutePath
    val schema = StructType(Seq(
      StructField("site_no", IntegerType),
      StructField("time", TimestampType),
      StructField("v", DoubleType)))
    // A micro-batch is a PARTIAL-day frame, so the streaming seam pairs
    // with the POINT-upsert sink — ParquetDaySink's partition replace
    // would delete a day's earlier rows when a later batch touches the
    // same day (the same pitfall the NMDB catch-up fix closed).
    val sinkFn = graft.operators.Sink.foreachBatch(
      new graft.operators.ParquetPointUpsertSink(out))
    def startQ() = spark.readStream.schema(schema)
      .csv(srcDir.getAbsolutePath)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch(sinkFn)
      .start()
    def storedTimes(): Set[java.sql.Timestamp] =
      graft.operators.IncrementalRunner.readLevel(spark, out)
        .select("time").as[java.sql.Timestamp].collect().toSet

    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "b1.csv").toPath,
      "1,2024-01-01 10:00:00,1.0\n1,2024-01-02 10:00:00,2.0\n")
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    assert(storedTimes() === Set(
      T("2024-01-01 10:00:00"), T("2024-01-02 10:00:00")))

    // RESTART from the same checkpoint; a new file (same day 1 partition)
    // arrives. The committed batch must not re-apply or duplicate, the
    // new one must land, and day 1's earlier row must survive the
    // day-partitioned upsert of the new batch.
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "b2.csv").toPath,
      "1,2024-01-01 11:00:00,3.0\n")
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    assert(storedTimes() === Set(
      T("2024-01-01 10:00:00"), T("2024-01-01 11:00:00"),
      T("2024-01-02 10:00:00")))
  }

  test("streaming NMDB path e2e: feed -> drift validation -> point-upsert " +
    "store (earlier same-day hours survive later batches)") {
    implicit val sql = spark.sqlContext
    val dir = tempDirFile("graft_nmdb_stream_")
    dir.deleteOnExit()
    val out = new java.io.File(dir, "store").getAbsolutePath
    val sinkFn = graft.operators.Sink.foreachBatch(
      new graft.operators.ParquetPointUpsertSink(out))
    val input = MemoryStream[IntensityPoint]
    val q = StreamingOps.validatedIntensityStream(input.toDS())
      .writeStream
      .foreachBatch((ds: org.apache.spark.sql.Dataset[
        graft.operators.IntensityOps.ValidatedPoint], id: Long) =>
        sinkFn(ds.toDF(), id))
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", new java.io.File(dir, "chk").getAbsolutePath)
      .start()
    input.addData(
      IntensityPoint(1, T("2024-01-01 10:00:00"), 100.0),
      IntensityPoint(1, T("2024-01-01 11:00:00"), 300.0)) // spike -> flagged
    q.processAllAvailable()
    input.addData( // SAME day, later hours: the store must keep 10/11:00
      IntensityPoint(1, T("2024-01-01 12:00:00"), 105.0),
      IntensityPoint(1, T("2024-01-01 13:00:00"), 106.0))
    q.processAllAvailable()
    q.stop()
    val stored = graft.operators.IncrementalRunner.readLevel(spark, out)
      .select("time", "bad_data_flag")
      .as[(java.sql.Timestamp, Int)].collect().toMap
    assert(stored === Map(
      T("2024-01-01 10:00:00") -> 0,
      T("2024-01-01 11:00:00") -> 1, // flagged spike persisted
      T("2024-01-01 12:00:00") -> 0, // validated against 100, not 300
      T("2024-01-01 13:00:00") -> 0))
  }

  test("indexIngest streams embeddings into a persisted IVF/PQ index " +
    "across micro-batches, and replayed batch ids are skipped") {
    implicit val sql = spark.sqlContext
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val h1 = emb.filter($"vec_id" < 250)
    val h2rows = emb.filter($"vec_id" >= 250)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val d = tempDirFile("graft_sidx_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    // build the base on exactly the columns the stream will carry —
    // append now refuses drifting caller schemas (an index built with
    // extra payload columns cannot ingest a narrower stream)
    graft.operators.IvfIndex.write(
      h1.select($"vec_id", $"embedding"), "vec_id", "embedding",
      kCells = 4, trainIters = 2, path = path,
      pq = Some(graft.operators.IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))

    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(StreamingOps.indexIngest(path, streamId = "ingest-a"))
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = h2rows.splitAt(125)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val vectors = spark.read.parquet(s"$path/vectors")
    assert(vectors.count() === 500)
    // appended rows carry PQ codes from the persisted subspace codebooks
    assert(vectors.filter($"vec_id" >= 250 && $"codes".isNull).count() === 0)

    // full-probe query over the streamed-into index == exact brute force
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val full = graft.operators.IvfIndex.query(
      spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = graft.operators.SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 300), "vec_id", "embedding", 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(full === brute)

    // a replayed batch id must be a no-op (the marker skip)
    StreamingOps.indexIngest(path, streamId = "ingest-a")(
      b1.toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$path/vectors").count() === 500,
      "replaying an applied batch id must not re-append")
  }

  test("sketchIngest: per-batch partials fold to the whole-stream " +
    "sketch, and a replayed batch overwrites its own partition") {
    implicit val sql = spark.sqlContext
    val d = tempDirFile("graft_qsk_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/sketch"
    val rows = (1L to 200L).map(i => (i, s"g${i % 3}", (i * 7 % 101).toDouble))
    val input = MemoryStream[(Long, String, Double)]
    val q = input.toDS().toDF("id", "g", "v")
      .writeStream
      .foreachBatch(StreamingOps.sketchIngest(
        path, Seq("g"), "id", "v", k = 32))
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = rows.splitAt(120)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    def sk(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"qsk".cast("array<struct<h:long,v:double>>"))
        .as[(String, Seq[(Long, Double)])].collect().sortBy(_._1).toSeq
    val streamed = StreamingOps.readSketch(spark, path, Seq("g"), 32)
    val oneShot = graft.operators.SketchOps.qSketch(
      rows.toDF("id", "g", "v"), Seq("g"), "id", "v", 32)
    assert(sk(streamed) === sk(oneShot))
    // estimates off the streamed sketch match the one-shot ones
    val est = graft.operators.SketchOps.qEstimate(
      streamed, Seq("g"), Seq(0.5))
      .select($"g", $"est").as[(String, Double)].collect().toMap
    val estOne = graft.operators.SketchOps.qEstimate(
      oneShot, Seq("g"), Seq(0.5))
      .select($"g", $"est").as[(String, Double)].collect().toMap
    assert(est === estOne)

    // replaying batch 0 rewrites its partition — a FRESH read folds to
    // the same whole-stream sketch (a reader plan resolved BEFORE the
    // rewrite holds the old file listing and fails transiently — the
    // readSketch contract says re-read after ingest activity)
    StreamingOps.sketchIngest(path, Seq("g"), "id", "v", 32)(
      b1.toDF("id", "g", "v"), 0L)
    assert(sk(StreamingOps.readSketch(spark, path, Seq("g"), 32))
      === sk(oneShot))
  }

  test("centroidIngest: per-batch centroid summaries fold to the " +
    "one-shot summarize, drift answers off streamed state, and a " +
    "replayed batch overwrites its own partition") {
    implicit val sql = spark.sqlContext
    import graft.operators.SimilarityOps
    val d = tempDirFile("graft_cent_")
    val path = d.getAbsolutePath + "/cent"
    // deterministic 4-dim vectors over 2 labels
    val rows = (1L to 60L).map(i =>
      (i % 2, Seq((i % 7).toDouble, (i % 5).toDouble,
        (i % 3).toDouble, 1.0)))
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDS().toDF("label", "vec")
      .writeStream
      .foreachBatch(StreamingOps.centroidIngest(path, "label", "vec"))
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = rows.splitAt(25)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.select($"label", $"dim", $"s1".cast("string"), $"n")
        .as[(Long, Int, String, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val streamed = StreamingOps.readCentroid(spark, path)
    val folded = sk(streamed)
    val oneShot = SimilarityOps.centroidSummarize(
      rows.toDF("label", "vec"), "label", "vec")
    assert(folded === sk(oneShot), "fold == one-shot summarize")
    // drift off the streamed state vs a shifted reference — answers
    // from summary rows alone, no vector history scanned
    val ref = SimilarityOps.centroidSummarize(
      rows.map { case (l, v) => (l, v.map(_ + 1.0)) }
        .toDF("label", "vec"), "label", "vec")
    val drift = SimilarityOps.centroidDriftFrom(streamed, ref)
      .select($"label", $"drift_l2").as[(Long, Double)]
      .collect().toMap
    // every dim shifted by exactly +1 → L2 = sqrt(4) = 2
    assert(drift(0L) === 2.0 && drift(1L) === 2.0, drift)
    // replaying batch 0 rewrites its own partition — fold unchanged
    StreamingOps.centroidIngest(path, "label", "vec")(
      b1.toDF("label", "vec"), 0L)
    assert(sk(StreamingOps.readCentroid(spark, path)) === folded)
  }

  test("cmsIngest: per-batch partials fold to the whole-stream sketch, " +
    "and cmsJoinSize answers off TWO streamed states without scanning " +
    "either history") {
    implicit val sql = spark.sqlContext
    val d = tempDirFile("graft_cms_")
    d.deleteOnExit()
    val pa = d.getAbsolutePath + "/ska"
    val pb = d.getAbsolutePath + "/skb"
    val left = (1L to 300L).map(i => i % 40)
    val right = (1L to 120L).map(i => i % 25)
    def ingest(path: String, rows: Seq[Long]): Unit = {
      val input = MemoryStream[Long]
      val q = input.toDS().toDF("v")
        .writeStream
        .foreachBatch(StreamingOps.cmsIngest(path, Nil, "v", 4, 64))
        .outputMode(OutputMode.Append).start()
      val (b1, b2) = rows.splitAt(rows.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      q.stop()
    }
    ingest(pa, left)
    ingest(pb, right)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.select($"depth_no", $"bucket", $"cnt")
        .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val streamedA = StreamingOps.readCmsSketch(spark, pa, Nil)
    // collect NOW: a plan holds the file listing of the moment it
    // resolved, and the replay below rewrites batch 0 — re-collecting
    // streamedA after that is exactly the transient-failure case the
    // readCmsSketch contract documents
    val foldedA = sk(streamedA)
    assert(foldedA === sk(graft.operators.SketchOps.cmsSketch(
      left.toDF("v"), Nil, "v", 4, 64)), "fold == one-shot build")
    // join-size estimate off the two streamed states: >= the true join
    // size, and identical to the estimate from one-shot builds
    val streamedB = StreamingOps.readCmsSketch(spark, pb, Nil)
    val est = graft.operators.SketchOps.cmsJoinSize(
      streamedA, streamedB, Nil).select($"est_join_size").as[Long].head()
    val exact = left.toDF("v").join(right.toDF("v"), "v").count()
    assert(est >= exact, s"est $est < exact $exact")
    val estOne = graft.operators.SketchOps.cmsJoinSize(
      graft.operators.SketchOps.cmsSketch(left.toDF("v"), Nil, "v", 4, 64),
      graft.operators.SketchOps.cmsSketch(right.toDF("v"), Nil, "v", 4, 64),
      Nil).select($"est_join_size").as[Long].head()
    assert(est === estOne)
    // replaying batch 0 rewrites its own partition — fold unchanged
    StreamingOps.cmsIngest(pa, Nil, "v", 4, 64)(
      left.splitAt(left.size / 2)._1.toDF("v"), 0L)
    assert(sk(StreamingOps.readCmsSketch(spark, pa, Nil)) === foldedA)
  }

  test("trendIngest: per-batch moment summaries fold to the one-shot " +
    "trend, and a replayed batch overwrites its own partition") {
    implicit val sql = spark.sqlContext
    val d = tempDirFile("graft_trend_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/trend"
    val base = 1704067200L
    val rows = (0 until 150).map(i =>
      (s"g${i % 2}", base + 600L * i, 1.0 + 0.05 * (i % 7) + 0.001 * i))
    val mk = (r: Seq[(String, Long, Double)]) =>
      r.toDF("k", "secs", "value")
        .select($"k", timestamp_seconds($"secs").as("ts"), $"value")
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDS().toDF("k", "secs", "value")
      .select($"k", timestamp_seconds($"secs").as("ts"), $"value")
      .writeStream
      .foreachBatch(StreamingOps.trendIngest(path, Seq("k"), "ts", "value"))
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = rows.splitAt(90)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(_.toSeq).toSeq
    val oneShot = graft.operators.TimeSeriesOps.olsTrend(
      mk(rows), Seq("k"), "ts", "value")
    assert(dump(StreamingOps.readTrend(spark, path, Seq("k"))) ===
      dump(oneShot), "streamed fold === one-shot trend")
    // replaying batch 0 rewrites its own partition, fold unchanged
    StreamingOps.trendIngest(path, Seq("k"), "ts", "value")(mk(b1), 0L)
    assert(dump(StreamingOps.readTrend(spark, path, Seq("k"))) ===
      dump(oneShot))
  }

  test("hllIngest: per-batch register partials fold to the whole-stream " +
    "sketch, and double-delivery across DIFFERENT batch ids leaves the " +
    "fold unchanged — max-idempotence, the property additive sketches " +
    "lack") {
    implicit val sql = spark.sqlContext
    val path = tempDir("graft_hll_") + "/sketch"
    val rows = (1L to 200L).map(i => (i, s"g${i % 3}", i * 7 % 101))
    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDS().toDF("id", "g", "v")
      .writeStream
      .foreachBatch(StreamingOps.hllIngest(path, Seq("g"), "v"))
      .outputMode(OutputMode.Append).start()
    val (b1, b2) = rows.splitAt(120)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    def sk(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"regs").as[(String, Seq[Int])]
        .collect().sortBy(_._1).toSeq
    val streamed = StreamingOps.readHllSketch(spark, path, Seq("g"))
    val oneShot = graft.operators.SketchOps.hllSketch(
      rows.toDF("id", "g", "v"), Seq("g"), "v")
    assert(sk(streamed) === sk(oneShot))
    // at-least-once delivery: batch 1's rows re-arrive under a NEW
    // batch id (not a partition overwrite — genuinely duplicated data)
    // and the fold still equals the one-shot sketch
    StreamingOps.hllIngest(path, Seq("g"), "v")(
      b1.toDF("id", "g", "v"), 99L)
    assert(sk(StreamingOps.readHllSketch(spark, path, Seq("g")))
      === sk(oneShot))
    // estimates off the streamed registers match the one-shot ones
    val est = graft.operators.SketchOps.hllEstimate(
      StreamingOps.readHllSketch(spark, path, Seq("g")), Seq("g"))
      .select($"g", $"n_distinct_est").as[(String, Double)]
      .collect().toMap
    val estOne = graft.operators.SketchOps.hllEstimate(
      oneShot, Seq("g"))
      .select($"g", $"n_distinct_est").as[(String, Double)]
      .collect().toMap
    assert(est === estOne)
  }

  test("substrIngest: per-batch window-hash partials fold to the " +
    "whole-corpus summary; flagging and deduping a NEW batch against " +
    "the folded index equals the union computation — the corpus text " +
    "is never re-read") {
    implicit val sql = spark.sqlContext
    val path = tempDir("graft_substr_") + "/index"
    val w = 4
    val b1 = Seq((1L, "a b c d e f"), (2L, "a b c d e z"))
    val b2 = Seq((3L, "b c d e f y"), (4L, "m n o p m n o p"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingOps.substrIngest(path, "doc_id", "text", w))
      .outputMode(OutputMode.Append).start()
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val seen = (b1 ++ b2).toDF("doc_id", "text")
    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"wh", $"cnt", $"minkey").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val folded = StreamingOps.readSubstrIndex(spark, path)
    assert(idxRows(folded) ===
      idxRows(graft.operators.DedupOps.substrIndex(
        seen, "doc_id", "text", w)))

    // a new arriving batch (doc 9 duplicates doc 1's opening window)
    val nb = Seq((9L, "a b c d x9 y9 z9")).toDF("doc_id", "text")
    val union = seen.union(nb)
    val flagged = graft.operators.DedupOps.substringSpansAgainst(
      folded, nb, "doc_id", "text", w)
      .select($"doc_id", $"n_dup_windows", $"dup_tokens")
      .as[(Long, Int, Long)].head()
    val unionRow = graft.operators.DedupOps.substringSpans(
      union, "doc_id", "text", w)
      .filter($"doc_id" === 9L)
      .select($"doc_id", $"n_dup_windows", $"dup_tokens")
      .as[(Long, Int, Long)].head()
    assert(flagged === unionRow)
    val cleaned = graft.operators.DedupOps.substringDedupAgainst(
      folded, nb, "doc_id", "text", w)
      .select($"text_dedup").as[String].head()
    assert(cleaned === "x9 y9 z9")
  }

  test("exactDedupStream: exact re-arrivals within the watermark drop " +
    "across micro-batches, distinct keys and later rows survive") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.exactDedupStream(
      input.toDS().toDF("id", "payload", "ts"),
      keys = Seq("id"), tsCol = "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("xdedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, "a", T("2024-01-01 10:00:00")),
      (1L, "a-dup", T("2024-01-01 10:10:00")), // same key, same batch
      (2L, "b", T("2024-01-01 10:05:00")))
    q.processAllAvailable()
    input.addData(
      (1L, "a-again", T("2024-01-01 10:20:00")), // cross-batch re-arrival
      (3L, "c", T("2024-01-01 10:30:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("xdedup_out")
      .select($"id", $"payload").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] {
      StreamingOps.exactDedupStream(
        input.toDS().toDF("id", "payload", "ts"), Seq.empty, "ts")
    }
  }

  test("intervalJoinStream: in-window pairs match across micro-batches, " +
    "out-of-window pairs don't, output equals the batch interval join") {
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = StreamingOps.intervalJoinStream(
      lIn.toDS().toDF("k", "lts"),
      rIn.toDS().toDF("k", "rts", "v"),
      keyCol = "k", leftTs = "lts", rightTs = "rts",
      before = "30 minutes", after = "30 minutes", watermark = "2 hours")
    val q = joined.writeStream.format("memory").queryName("ivj_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: left events; batch 2: rights arriving later (cross-batch)
    lIn.addData(
      (1L, T("2024-01-01 10:00:00")),
      (1L, T("2024-01-01 12:00:00")),
      (2L, T("2024-01-01 10:00:00")))
    q.processAllAvailable()
    rIn.addData(
      (1L, T("2024-01-01 10:20:00"), 1.0), // in window of 10:00 only
      (1L, T("2024-01-01 11:00:00"), 2.0), // in nobody's ±30min
      (2L, T("2024-01-01 10:29:00"), 3.0)) // key 2 match
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ivj_out")
      .select($"k", $"lts".cast("string"), $"v")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(got === Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (2L, "2024-01-01 10:00:00", 3.0)))
    // and the batch form of the same join agrees
    val lb = Seq((1L, T("2024-01-01 10:00:00")),
      (1L, T("2024-01-01 12:00:00")), (2L, T("2024-01-01 10:00:00")))
      .toDF("k", "lts")
    val rb = Seq((1L, T("2024-01-01 10:20:00"), 1.0),
      (1L, T("2024-01-01 11:00:00"), 2.0),
      (2L, T("2024-01-01 10:29:00"), 3.0)).toDF("k", "rts", "v")
    val batch = StreamingOps.intervalJoinStream(
      lb, rb, "k", "lts", "rts", "30 minutes", "30 minutes", "2 hours")
      .select($"k", $"lts".cast("string"), $"v")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(batch === got)
    intercept[IllegalArgumentException] {
      StreamingOps.intervalJoinStream(lb, rb, "k", "ts", "ts")
    }
  }

  test("dedupIngest: cross-batch duplicate visibility through the store, " +
    "flag log lands per batch, replayed batch ids are skipped") {
    implicit val sql = spark.sqlContext
    val d = tempDirFile("graft_sdedup_")
    d.deleteOnExit()
    val store = d.getAbsolutePath + "/store"
    val flagsP = d.getAbsolutePath + "/flags"
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta"
    graft.operators.DedupStore.write(
      Seq((1L, corpusText)).toDF("doc_id", "text"), "doc_id", "text", store)

    val freshText = "red orange yellow green blue indigo violet"
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingOps.dedupIngest(
        store, flagsP, streamId = "dedup-a", tau = 0.5))
      .outputMode(OutputMode.Append).start()
    input.addData((10L, corpusText), (11L, freshText)) // dup of stored, clean
    q.processAllAvailable()
    input.addData((20L, freshText), (21L, "wholly new words here now"))
    q.processAllAvailable()
    q.stop()

    val flags = spark.read.parquet(flagsP)
      .select($"doc_id", $"is_dup", $"dup_of", $"batch_id")
      .as[(Long, Boolean, Option[Long], Long)].collect().sortBy(_._1).toSeq
    assert(flags === Seq(
      (10L, true, Some(1L), 0L),
      (11L, false, None, 0L),
      (20L, true, Some(11L), 1L), // batch-2 dup of batch-1's ADMITTED doc
      (21L, false, None, 1L)))
    // the store admitted exactly the clean docs (2 bands per doc)
    val storedIds = spark.read.parquet(s"$store/rows")
      .select($"id").distinct().as[Long].collect().sorted.toSeq
    assert(storedIds === Seq(1L, 11L, 21L))

    // replaying an applied batch id must change nothing
    StreamingOps.dedupIngest(store, flagsP, "dedup-a", 0.5)(
      Seq((10L, corpusText)).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(flagsP).count() === 4)

    // a rebuild clears the marker space: the same batch id applies again
    graft.operators.DedupStore.write(
      Seq((1L, corpusText)).toDF("doc_id", "text"), "doc_id", "text", store)
    StreamingOps.dedupIngest(store, flagsP, "dedup-a", 0.5)(
      Seq((30L, freshText)).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(flagsP).count() === 5)
  }

  test("decontaminateIngest: per-batch verdicts against the static " +
    "benchmark land once, replayed batch ids are skipped") {
    implicit val sql = spark.sqlContext
    val d = tempDirFile("graft_sdecon_")
    d.deleteOnExit()
    val flagsP = d.getAbsolutePath + "/flags"
    val evalItem = "which year did the treaty of utrecht end the war"
    val bench = Seq((1000L, evalItem)).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingOps.decontaminateIngest(
        bench, "doc_id", "text", flagsP, tau = 0.5))
      .outputMode(OutputMode.Append).start()
    input.addData(
      (10L, evalItem + " exactly"), // near-dup of the eval item
      (11L, "completely different text about soil moisture sensors"))
    q.processAllAvailable()
    input.addData((20L, evalItem)) // verbatim leak in a later batch
    q.processAllAvailable()
    q.stop()

    val flags = spark.read.parquet(flagsP)
      .select($"doc_id", $"is_contaminated", $"batch_id")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(flags === Seq(
      (10L, true, 0L), (11L, false, 0L), (20L, true, 1L)))

    // replaying an applied batch id must append nothing
    StreamingOps.decontaminateIngest(bench, "doc_id", "text", flagsP, 0.5)(
      Seq((10L, evalItem)).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(flagsP).count() === 3)

    // the ADVICE r12 crash window: flags written but the _applied
    // marker lost (crash between the two steps). A replay must
    // OVERWRITE the batch's partition directory, not append a second
    // copy of its rows.
    val fs = new org.apache.hadoop.fs.Path(flagsP)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$flagsP/_applied/batch-1"),
      true)
    StreamingOps.decontaminateIngest(bench, "doc_id", "text", flagsP, 0.5)(
      Seq((20L, evalItem)).toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(flagsP).count() === 3)
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$flagsP/_applied/batch-1")))
  }

  test("sessionStream: sessions close when the watermark passes the gap, " +
    "in-gap events extend and MERGE windows, the emitted rows match the " +
    "batch sessionize on the same events") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingOps.sessionStream(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    // session A: two events 10 min apart; then one 40 min later ->
    // session B; feeding a much-later event advances the watermark so
    // both emit
    input.addData(
      (1L, T("2024-01-01 10:00:00")),
      (1L, T("2024-01-01 10:10:00")))
    q.processAllAvailable()
    input.addData((1L, T("2024-01-01 10:50:00")))
    q.processAllAvailable()
    // watermark rides max(eventTime) - 30 min: push it past both closes
    input.addData((2L, T("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // one more tick so the state store finalizes windows under the
    // advanced watermark
    input.addData((2L, T("2024-01-01 14:00:00")))
    q.processAllAvailable()
    val got = spark.table("sess_out")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    q.stop()
    assert(got === Set(
      (1L, T("2024-01-01 10:00:00"), T("2024-01-01 10:10:00"), 2L),
      (1L, T("2024-01-01 10:50:00"), T("2024-01-01 10:50:00"), 1L),
      // the watermark-driving event's own session closed too once 14:00
      // pushed the watermark past 13:00 + gap
      (2L, T("2024-01-01 13:00:00"), T("2024-01-01 13:00:00"), 1L)))

    // the emitted user-1 sessions equal the batch operator's on the
    // same rows (user 2's open 14:00 session has no batch analogue yet)
    val batch = graft.operators.TimeSeriesOps.sessionize(
      Seq((1L, T("2024-01-01 10:00:00")),
        (1L, T("2024-01-01 10:10:00")),
        (1L, T("2024-01-01 10:50:00"))).toDF("user_id", "ts"),
      Seq("user_id"), "ts", gapSeconds = 1800L)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    assert(batch === got.filter(_._1 == 1L))
  }

  test("hourlyStats windows with watermark (batch-mode check)") {
    val df = Seq(
      (1, T("2024-01-01 10:05:00"), 10.0),
      (1, T("2024-01-01 10:55:00"), 20.0),
      (1, T("2024-01-01 11:05:00"), 30.0))
      .toDF("site_no", "ts", "v")
    val out = StreamingOps.hourlyStats(df, "ts", "v")
      .orderBy("hour_start")
      .collect().map(r => (r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (T("2024-01-01 10:00:00"), 2L, 15.0),
      (T("2024-01-01 11:00:00"), 1L, 30.0)))
  }

  test("enrichStream: snapshot semantics (pinned dim listing), unknown " +
    "keys survive as nulls, the dimension broadcasts; enrichForeachBatch " +
    "sees an in-place dimension overwrite on the very next batch") {
    implicit val sql = spark.sqlContext
    import java.nio.file.Files
    val dimDir = tempDir("graft_enrich_dim_")
    Seq((1L, "alpha"), (2L, "beta")).toDF("k", "name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val input = MemoryStream[(Long, Double)]
    val enriched = StreamingOps.enrichStream(
      input.toDS().toDF("k", "v"), dim, "k")
    val q = enriched.writeStream.format("memory").queryName("enr_out")
      .outputMode(OutputMode.Append).start()
    input.addData((1L, 10.0), (3L, 30.0)) // 3 has no dim row yet
    q.processAllAvailable()
    // SNAPSHOT pin: APPEND a key-3 dim row between batches — the fixed
    // static frame's listing was taken at creation, so batch 2 must
    // still see key 3 as unknown (the scaladoc's stated semantics)
    Seq((3L, "gamma")).toDF("k", "name")
      .write.mode("append").parquet(dimDir)
    input.addData((3L, 31.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enr_out")
      .select($"k", $"v", $"name").as[(Long, Double, Option[String])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 10.0, Some("alpha")),
      (3L, 30.0, None),
      (3L, 31.0, None))) // appended dim row invisible to the snapshot
    // the fact side must not shuffle: dimension joins as a broadcast
    val plan = StreamingOps.enrichStream(
      Seq((1L, 1.0)).toDF("k", "v"), dim, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    intercept[IllegalArgumentException] {
      StreamingOps.enrichStream(
        Seq((1L, 1.0)).toDF("k", "v"),
        Seq((1L, 2.0)).toDF("k", "v"), "k")
    }

    // enrichForeachBatch: re-reads the dim per batch, so an in-place
    // OVERWRITE between batches is visible with no restart
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Option[String])]
    val input2 = MemoryStream[(Long, Double)]
    val q2 = input2.toDS().toDF("k", "v").writeStream
      .foreachBatch(StreamingOps.enrichForeachBatch(dimDir, "k") {
        (df, _) =>
          seen ++= df.select($"k", $"v", $"name")
            .as[(Long, Double, Option[String])].collect()
      })
      .outputMode(OutputMode.Append).start()
    input2.addData((1L, 10.0))
    q2.processAllAvailable()
    Seq((1L, "alpha2")).toDF("k", "name")
      .write.mode("overwrite").parquet(dimDir)
    input2.addData((1L, 11.0))
    q2.processAllAvailable()
    q2.stop()
    assert(seen.sortBy(_._2).toSeq === Seq(
      (1L, 10.0, Some("alpha")),
      (1L, 11.0, Some("alpha2")))) // fresh name, no restart
  }

  test("runStream: batch-split invariance — any split of the same event " +
    "sequence yields the same completed runs") {
    implicit val sql = spark.sqlContext
    import StreamingOps.{CompletedRun, RunEvent}
    // a fixed mixed sequence for one key: runs a(2), b(1), ∅(2), a(1),
    // then an open tail c — completed set must not depend on batching
    val events = Seq("a", "a", "b", null, null, "a", "c").zipWithIndex
      .map { case (v, i) => RunEvent(1L, T(s"2024-01-01 00:00:0$i"), v) }
    def runWith(splitAt: Int): Seq[(Long, Long, Option[String], Long)] = {
      val input = MemoryStream[RunEvent]
      val name = s"runs_split_$splitAt"
      val q = StreamingOps.runStream(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      val (b1, b2) = events.splitAt(splitAt)
      if (b1.nonEmpty) { input.addData(b1: _*); q.processAllAvailable() }
      if (b2.nonEmpty) { input.addData(b2: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[CompletedRun].collect()
        .sortBy(_.run_id).map(r => (r.key, r.run_id, r.value, r.run_len))
        .toSeq
    }
    val oneShot = runWith(0)
    assert(oneShot === Seq(
      (1L, 1L, Some("a"), 2L), (1L, 2L, Some("b"), 1L),
      (1L, 3L, None, 2L), (1L, 4L, Some("a"), 1L)))
    (1 until events.size).foreach { cut =>
      assert(runWith(cut) === oneShot, s"split at $cut diverged")
    }
  }

  test("heavyHittersStream: Misra-Gries summaries carry across batches " +
    "with at most k-1 counters, every item above processed/k survives, " +
    "and estimates never exceed true counts") {
    implicit val sql = spark.sqlContext
    import StreamingOps.{HeavyHitter, ItemEvent}
    val input = MemoryStream[ItemEvent]
    val q = StreamingOps.heavyHittersStream(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    // batch 1: a,a,a,b,c,a,b,a — the c arrival decrements (evicts b),
    // b re-enters later; hand-folded summary is {a:4, b:1}, n=8
    input.addData(
      ItemEvent(1L, 1, "a"), ItemEvent(1L, 2, "a"), ItemEvent(1L, 3, "a"),
      ItemEvent(1L, 4, "b"), ItemEvent(1L, 5, "c"), ItemEvent(1L, 6, "a"),
      ItemEvent(1L, 7, "b"), ItemEvent(1L, 8, "a"))
    q.processAllAvailable()
    val b1 = spark.table("hh_out").as[HeavyHitter].collect()
      .filter(_.processed == 8L).map(h => (h.item, h.est)).toSet
    assert(b1 === Set(("a", 4L), ("b", 1L)))
    // batch 2: four c's — state carries, b evicts, c climbs;
    // hand-folded summary is {a:3, c:3}, n=12
    input.addData(
      ItemEvent(1L, 9, "c"), ItemEvent(1L, 10, "c"),
      ItemEvent(1L, 11, "c"), ItemEvent(1L, 12, "c"))
    q.processAllAvailable()
    q.stop()
    val b2 = spark.table("hh_out").as[HeavyHitter].collect()
      .filter(_.processed == 12L).map(h => (h.item, h.est)).toSet
    assert(b2 === Set(("a", 3L), ("c", 3L)))
    // the MG guarantee on the final summary: true a=5, c=5, b=2 over
    // n=12 with k=3 — every item with freq > n/k=4 present (a, c both
    // are), and each estimate underestimates by at most n/k
    assert(b2.forall { case (i, est) =>
      val truth = Map("a" -> 5L, "c" -> 5L)(i)
      est <= truth && est >= truth - 12 / 3
    })
  }

  test("runStream: completed runs emit on value change, a run spanning " +
    "batches emits once with the full span and sequential ids, null " +
    "values form their own runs, the open tail never emits") {
    implicit val sql = spark.sqlContext
    import StreamingOps.{CompletedRun, RunEvent}
    val input = MemoryStream[RunEvent]
    val q = StreamingOps.runStream(input.toDS())
      .writeStream.format("memory").queryName("runs_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: key1 a,a,b → run1(a,2) completes when b arrives;
    // key2 opens a null-valued run (no emission yet)
    input.addData(
      RunEvent(1L, T("2024-01-01 00:00:01"), "a"),
      RunEvent(1L, T("2024-01-01 00:00:02"), "a"),
      RunEvent(1L, T("2024-01-01 00:00:03"), "b"),
      RunEvent(2L, T("2024-01-01 00:00:01"), null))
    q.processAllAvailable()
    val afterB1 = spark.table("runs_out")
      .as[CompletedRun].collect().toSeq
    assert(afterB1.map(r => (r.key, r.run_id, r.value, r.run_len)) ===
      Seq((1L, 1L, Some("a"), 2L)))
    // batch 2: key1's b-run EXTENDS across the batch boundary then c
    // closes it — one emission, full span, id 2; key2's null run closes
    input.addData(
      RunEvent(1L, T("2024-01-01 00:00:04"), "b"),
      RunEvent(1L, T("2024-01-01 00:00:05"), "c"),
      RunEvent(2L, T("2024-01-01 00:00:02"), "x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("runs_out").as[CompletedRun].collect()
      .sortBy(r => (r.key, r.run_id)).toSeq
      .map(r => (r.key, r.run_id, r.value, r.run_len,
        r.run_start.toString.substring(11, 19),
        r.run_end.toString.substring(11, 19)))
    assert(got === Seq(
      (1L, 1L, Some("a"), 2L, "00:00:01", "00:00:02"),
      (1L, 2L, Some("b"), 2L, "00:00:03", "00:00:04"), // cross-batch
      (2L, 1L, None, 1L, "00:00:01", "00:00:01"))) // null run stands
    // the open tails (key1 "c", key2 "x") are state, not output
    assert(got.size === 3)
  }

  test("state-store bounds (VERDICT r14 item 5): runStream state stays " +
    "FLAT at |keys| as events grow; exactDedupStream state EXPIRES with " +
    "the watermark instead of accumulating every key ever seen") {
    implicit val sql = spark.sqlContext
    def lastState(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Long, Long) = {
      val s = q.recentProgress.toSeq
        .flatMap(_.stateOperators.headOption).last
      (s.numRowsTotal, s.numRowsRemoved)
    }
    val nKeys = 2000
    val base = 1704067200000L
    // runStream: 3 batches x one event per key, alternating values —
    // every batch closes the previous run, state must hold at |keys|
    val runIn = MemoryStream[StreamingOps.RunEvent]
    val runQ = StreamingOps.runStream(runIn.toDS())
      .writeStream.format("noop").outputMode(OutputMode.Append).start()
    for (b <- 0 until 3) {
      runIn.addData((0 until nKeys).map(k =>
        StreamingOps.RunEvent(k.toLong,
          new java.sql.Timestamp(base + b * 60000L),
          if (b % 2 == 0) "a" else "b")))
      runQ.processAllAvailable()
      assert(lastState(runQ)._1 === nKeys.toLong, s"after batch $b")
    }
    runQ.stop()
    // exactDedupStream: a resend adds no rows; a generation a full
    // horizon later evicts the old one — state never holds 2 generations
    val dIn = MemoryStream[(Long, java.sql.Timestamp)]
    val dQ = StreamingOps.exactDedupStream(
      dIn.toDF().toDF("k", "ts"), Seq("k"), "ts", watermark = "10 minutes")
      .writeStream.format("noop").outputMode(OutputMode.Append).start()
    def gen(lo: Int, hi: Int, atMs: Long) =
      (lo until hi).map(k => (k.toLong, new java.sql.Timestamp(atMs)))
    dIn.addData(gen(0, nKeys, base)); dQ.processAllAvailable()
    assert(lastState(dQ)._1 === nKeys.toLong)
    dIn.addData(gen(0, nKeys, base)); dQ.processAllAvailable()
    assert(lastState(dQ)._1 === nKeys.toLong, "dup resend added state")
    // 1 h later = far past the 10 min watermark: the first generation
    // must be removed once the watermark advances (eviction runs on the
    // batch AFTER the one that moves the watermark, hence two batches)
    dIn.addData(gen(nKeys, 2 * nKeys, base + 3600000L))
    dQ.processAllAvailable()
    dIn.addData(gen(2 * nKeys, 3 * nKeys, base + 7200000L))
    dQ.processAllAvailable()
    val (rows, removed) = lastState(dQ)
    dQ.stop()
    assert(removed > 0L, "watermark never evicted state")
    assert(rows <= 2L * nKeys,
      s"state accumulated beyond a generation + in-flight: $rows")
  }
}
