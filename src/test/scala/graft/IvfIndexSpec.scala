package graft

import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Persistent IVF index: build-once/query-many must agree with the
  * in-memory composition, and the query scan must be partition-pruned
  * to the probed cells (the point of the layout).
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("query over the persisted index == in-memory ivfTopKLearned, " +
    "and the scan prunes to the probed cells") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivf_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .as[Array[Double]].head()
    val fromIndex = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10)
    val inMemory = SimilarityOps.ivfTopKLearned(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding",
      kCells = 4, trainIters = 2, nprobe = 2, k = 10)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    assert(rows(fromIndex) === rows(inMemory))

    // the layout payoff: the vector scan carries the probed cells as
    // PARTITION filters (pruned before IO), not a post-scan filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("large-kCells write routes assignment through the coarse-" +
    "quantizer tree with every row's cell identical to the flat argmin") {
    // VERDICT r15 item 1: past SimilarityOps.TreeAssignThreshold the
    // build's per-row assignment runs the two-level tree; the persisted
    // layout must be cell-for-cell what the flat O(k·d) argmin would
    // have written (full-probe == brute force is codebook-INDEPENDENT,
    // but cell equality is the stronger pin and costs one pass here).
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivftree_")
    val path = d.getAbsolutePath + "/index"
    val kCells = SimilarityOps.TreeAssignThreshold + 8 // forces the tree
    IvfIndex.write(emb, "vec_id", "embedding", kCells = kCells,
      trainIters = 2, path = path)
    val meta = IvfIndex.readMeta(spark, path)
    assert(meta.kCells === kCells && !meta.kCellsAuto)
    val cb = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect().toSeq
    val cents = SimilarityOps.centroidArrays(cb)
    assert(cents.length === kCells)
    val persisted = spark.read.parquet(s"$path/vectors")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val flat = emb.select($"vec_id",
      SimilarityOps.nearestExprFlat($"embedding", cents)
        .getField("cluster").as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(persisted === flat,
      "tree-assigned cells must equal the flat argmin on every row")
  }

  test("kCells = 0 auto-sizes to min(ceil(sqrt(n)), cap), records the " +
    "choice in _meta, and the layout serves normally") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfauto_")
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", trainIters = 2, path = path)
    val n = emb.count()
    val expectK = math.max(4, math.min(IvfIndex.AutoKCellsCap.toLong,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val meta = IvfIndex.readMeta(spark, path)
    assert(meta.kCells === expectK, s"n=$n")
    assert(meta.kCellsAuto, "_meta must record that kCells was auto-sized")
    // the auto-sized layout is a normal index: full probe == brute force
    val qvec = emb.filter($"vec_id" === 3)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val got = IvfIndex.query(spark, path, qvec, excludeId = Some(3L),
      nprobe = expectK, k = 5)
      .select($"vec_id").as[Long].collect().toSeq
    val brute = SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 3), "vec_id", "embedding", 5)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got === brute)
  }

  test("queryBatch == a per-query loop of single queries; the batch scan " +
    "prunes to the union of probed cells and group-limits per query") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfb_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val qids = Seq(0L, 250L, 499L)
    val batch = IvfIndex.queryBatch(spark, path,
      emb.filter($"vec_id".isin(qids: _*)), nprobe = 2, k = 10)
    val got = batch.select($"qid", $"vec_id", $"cell", $"sim", $"rank")
      .as[(Long, Long, Int, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4, t._5))
        .sortBy(_._4).toSeq).toMap

    qids.foreach { qid =>
      val qvec = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).as[Array[Double]].head()
      val single = IvfIndex.query(spark, path, qvec, excludeId = Some(qid),
      nprobe = 2, k = 10)
        .select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
      assert(got(qid) === single, s"batch result for qid=$qid diverges")
    }

    val plan = batch.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)
    // the per-query rank filter must group-limit map-side, not shuffle
    // the full candidate set
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("filtered search: a metadata predicate reaches the pruned scan as " +
    "a PushedFilter, and full-probe filtered query == filtered brute force") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivff_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val filtered = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10,
      where = Some($"label" === 2))

    // k survives a selective predicate: top-10 among label-2 rows only
    val got = filtered.select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = graft.operators.SimilarityOps.bruteForceTopK(
      emb.filter($"label" === 2), emb.filter($"vec_id" === 0),
      "vec_id", "embedding", 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)
    assert(got.size === 10, "selective predicate must not shrink k")

    // the predicate is pushed into the (partition-pruned) parquet scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).isDefined,
      plan)
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)

    // batch form agrees with the single-query form under the same filter
    val batchGot = IvfIndex.queryBatch(spark, path,
      emb.filter($"vec_id" === 0), nprobe = 4, k = 10, where = Some($"label" === 2))
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(batchGot === got)
  }

  test("queryAdcBatch == a per-query loop of queryAdc, with the batch " +
    "ADC pass pruned to probed cells and group-limited per query") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfab_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path, pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))

    val qids = Seq(0L, 250L, 499L)
    val batch = IvfIndex.queryAdcBatch(spark, path,
      emb.filter($"vec_id".isin(qids: _*)), nprobe = 2, k = 10, refine = 50)
    val got = batch.select($"qid", $"vec_id", $"cell", $"sim", $"rank")
      .as[(Long, Long, Int, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4, t._5))
        .sortBy(_._4).toSeq).toMap

    qids.foreach { qid =>
      val qvec = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).as[Array[Double]].head()
      val single = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(qid),
      nprobe = 2, k = 10, refine = 50)
        .select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
      assert(got(qid) === single, s"batch ADC result for qid=$qid diverges")
    }

    val plan = batch.queryExecution.executedPlan.toString
    // BOTH vector scans — the codes pass and the exact re-rank — must be
    // partition-pruned to the probed cells; an unpruned re-rank would be
    // a second full-corpus scan
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findAllIn(plan).size >= 2,
      plan)
    assert(plan.contains("WindowGroupLimit"), plan)
    // the ADC scan reads codes, never embedding vectors
    val codeSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      .filter(_.contains("codes"))
    assert(codeSchemas.nonEmpty && codeSchemas.forall(!_.contains("embedding")),
      s"batch ADC scan must not read vectors:\n$plan")
  }

  test("append grows the index without retraining: new vectors land in " +
    "their nearest frozen cell, old rows are untouched, and a full-probe " +
    "query equals brute force over the union") {
    val emb = Tables(spark, dir, "embeddings")
    val h1 = emb.filter($"vec_id" < 250)
    val h2 = emb.filter($"vec_id" >= 250)
    val d = tempDirFile("graft_ivfa_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(h1, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val before = spark.read.parquet(s"$path/vectors")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap

    IvfIndex.append(spark, path, h2)

    val after = spark.read.parquet(s"$path/vectors")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(after.size === 500, "all 500 vectors present after append")
    before.foreach { case (id, cell) =>
      assert(after(id) === cell, s"append must not move existing id=$id")
    }

    // independent driver-side check of the appended assignment: each new
    // vector's cell must hold the (replicated decimal) minimum squared
    // euclidean distance to the frozen codebook — a metric mix-up
    // (e.g. assigning by cosine, which the QUERY side uses) fails this
    val cb = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val vecs = h2.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    vecs.foreach { case (id, v) =>
      val d2 = cb.map { case (cell, c) =>
        cell -> (0 until v.length).map { i =>
          val diff = v(i).toDouble - c(i)
          BigDecimal(diff * diff).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      }
      val dmin = d2.values.min
      assert(d2(after(id)) <= dmin + BigDecimal("0.000000001"),
        s"id=$id in cell ${after(id)} (d2=${d2(after(id))}) but min is $dmin")
    }

    // full probe over the grown index == exact brute force over the union
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val full = IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = graft.operators.SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 300), "vec_id", "embedding", 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(full === brute)
  }

  test("append to a PQ layout encodes new rows against the persisted " +
    "subspace codebooks") {
    val emb = Tables(spark, dir, "embeddings")
    val h1 = emb.filter($"vec_id" < 250)
    val h2 = emb.filter($"vec_id" >= 250)
    val d = tempDirFile("graft_ivfap_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(h1, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path, pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))

    IvfIndex.append(spark, path, h2)

    val pqCb = spark.read.parquet(s"$path/pq_codebook")
      .as[(Int, Int, Int, Double)].collect().toSeq
    val expected = graft.operators.SimilarityOps
      .pqEncode(h2, "vec_id", "embedding", pqCb)
      .as[(Long, Seq[Int])].collect().toMap
    val stored = spark.read.parquet(s"$path/vectors")
      .filter($"vec_id" >= 250)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(stored === expected)

    // the serving contract still holds on the grown index: full-refine
    // ADC query == plain IVF query
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    val exact = IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 2, k = 10)
    val viaAdc = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(300L),
      nprobe = 2, k = 10, refine = 10000)
    assert(rows(viaAdc) === rows(exact))
  }

  test("append to a RESIDUAL PQ layout encodes new rows' residuals " +
    "against their assigned frozen cells") {
    val emb = Tables(spark, dir, "embeddings")
    val h1 = emb.filter($"vec_id" < 250)
    val h2 = emb.filter($"vec_id" >= 250)
    val d = tempDirFile("graft_ivfar_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(h1, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
        residual = true)))

    IvfIndex.append(spark, path, h2)

    // independently recompute: each appended row's residual against the
    // cell append CHOSE for it, encoded with the persisted subspace
    // codebooks — an append that encoded raw vectors, or residuals
    // against the wrong centroid, fails here
    val centArr = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (c, rs) => (c, rs.sortBy(_._2).map(_._3)) }
      .toDF("cell", "__centroid")
    val assigned = spark.read.parquet(s"$path/vectors")
      .filter($"vec_id" >= 250).select($"vec_id", $"cell", $"codes")
    val resid = h2.join(assigned.select($"vec_id", $"cell"), Seq("vec_id"))
      .join(broadcast(centArr), Seq("cell"))
      .select($"vec_id",
        zip_with($"embedding".cast("array<double>"), $"__centroid",
          (a, b) => a - b).as("rv"))
    val pqCb = spark.read.parquet(s"$path/pq_codebook")
      .as[(Int, Int, Int, Double)].collect().toSeq
    val expected = SimilarityOps.pqEncode(resid, "vec_id", "rv", pqCb)
      .as[(Long, Seq[Int])].collect().toMap
    val stored = assigned.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(stored === expected)

    // serving contract on the grown residual index: full-refine ADC ==
    // plain IVF query, including appended rows among the results
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    val exact = IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)
    val viaAdc = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10, refine = 10000)
    assert(rows(viaAdc) === rows(exact))
    assert(rows(exact).exists(_._1 >= 250),
      "appended rows must be reachable through the residual ADC path")
  }

  test("degenerate corpus: duplicate-heavy input drops empty cells and " +
    "full-probe query still equals brute force") {
    import org.apache.spark.sql.functions.col
    // 40 identical vectors + one outlier: the 4 lowest-id seeds coincide,
    // every row ties to the lowest cluster, clusters 1-3 lose all members
    // and the Lloyd's update drops them — the standard empty-cluster path.
    // The index must build on the SURVIVING cells and stay correct.
    val vecs = ((0L until 40L).map(i => (i, Array(1.0f, 2.0f))) :+
      (40L, Array(5.0f, 6.0f))).toDF("vec_id", "embedding")
    val d = tempDirFile("graft_ivfg_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(vecs, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val cells = IvfIndex.stats(spark, path)
      .as[(Int, Long, Long)].collect().toSeq
    assert(cells.map(_._2).sum === 41)
    assert(cells.size < 4, s"empty cells must drop from the layout: $cells")

    val qvec = vecs.filter(col("vec_id") === 40)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val got = IvfIndex.query(spark, path, qvec, excludeId = Some(40L),
      nprobe = 4, k = 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = graft.operators.SimilarityOps.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") === 40), "vec_id", "embedding", 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)
  }

  test("delete rewrites only the affected cells, removes emptied cell " +
    "directories, and queries never see deleted rows") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfd_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path, pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))

    val all = spark.read.parquet(s"$path/vectors")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val filesBefore = spark.read.parquet(s"$path/vectors")
      .select($"cell", $"_metadata.file_path")
      .as[(Int, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

    val doomed = Seq(0L, 1L, 2L, 3L, 4L)
    val doomedCells = doomed.map(all).toSet
    IvfIndex.delete(spark, path,
      doomed.toDF("vec_id"))

    val after = spark.read.parquet(s"$path/vectors")
    assert(after.count() === 495)
    assert(after.filter($"vec_id".isin(doomed: _*)).count() === 0)
    // untouched cells keep their exact files (no index-wide rewrite)
    val filesAfter = after.select($"cell", $"_metadata.file_path")
      .as[(Int, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    filesBefore.keys.filterNot(doomedCells).foreach { cell =>
      assert(filesAfter(cell) === filesBefore(cell),
        s"cell $cell was rewritten though it held no deleted id")
    }
    // PQ codes survive the rewrite
    assert(after.filter($"codes".isNull).count() === 0)

    // full-probe query == brute force over the remaining corpus
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val got = IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = graft.operators.SimilarityOps.bruteForceTopK(
      emb.filter(!$"vec_id".isin(doomed: _*)),
      emb.filter($"vec_id" === 300), "vec_id", "embedding", 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)
  }

  test("delete that empties a cell removes its directory entirely") {
    import org.apache.spark.sql.functions.col
    // two tight blobs -> k=2 trains one cell per blob (the kmeans spec
    // fixture); deleting all of blob B must erase its cell directory
    val vecs = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.2f, 0.1f)),
      (3L, Array(10.0f, 10.1f)), (4L, Array(10.1f, 9.9f)), (5L, Array(9.9f, 10.0f)))
      .toDF("vec_id", "embedding")
    val d = tempDirFile("graft_ivfe_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(vecs, "vec_id", "embedding", kCells = 2, trainIters = 3,
      path = path)
    val blobBCell = spark.read.parquet(s"$path/vectors")
      .filter(col("vec_id") === 3).select($"cell").as[Int].head()

    IvfIndex.delete(spark, path, Seq(3L, 4L, 5L).toDF("vec_id"))

    val stats = IvfIndex.stats(spark, path)
      .as[(Int, Long, Long)].collect().toSeq
    assert(stats.map(_._2).sum === 3)
    assert(!stats.exists(_._1 == blobBCell),
      s"emptied cell $blobBCell must vanish from the layout: $stats")
    assert(!new java.io.File(s"$path/vectors/cell=$blobBCell").exists(),
      "emptied cell directory must be deleted, not left with stale files")
  }

  test("compact collapses append-accumulated files to one per cell " +
    "without changing any query result; stats reports the repair") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfc_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb.filter($"vec_id" < 200), "vec_id", "embedding",
      kCells = 4, trainIters = 2, path = path)
    // three appends -> every touched cell gains files
    Seq((200L, 300L), (300L, 400L), (400L, 500L)).foreach { case (lo, hi) =>
      IvfIndex.append(spark, path,
        emb.filter($"vec_id" >= lo && $"vec_id" < hi))
    }
    val before = IvfIndex.stats(spark, path)
      .as[(Int, Long, Long)].collect().toSeq
    assert(before.map(_._2).sum === 500)
    assert(before.exists(_._3 > 1), s"appends should fragment cells: $before")

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def topk() = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10)
      .select($"vec_id", $"cell", $"sim", $"rank")
      .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    val resultBefore = topk()

    IvfIndex.compact(spark, path)

    val after = IvfIndex.stats(spark, path)
      .as[(Int, Long, Long)].collect().toSeq
    assert(after.map(_._2).sum === 500, "compact must not lose rows")
    assert(after.forall(_._3 === 1), s"one file per cell after compact: $after")
    assert(after.map(c => c._1 -> c._2).toMap ===
      before.map(c => c._1 -> c._2).toMap, "per-cell membership unchanged")
    assert(topk() === resultBefore, "query results unchanged by compact")
  }

  test("IVF x PQ: queryAdc == query at full refine; the ADC pass is " +
    "partition-pruned and reads codes, never vectors") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfpq_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path, pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .as[Array[Double]].head()

    // refine >= every probed cell's population -> the exact re-rank sees
    // all candidates, so the result must equal the plain IVF query
    val exact = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10)
    val viaAdc = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10, refine = 10000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    assert(rows(viaAdc) === rows(exact))

    // candidate distances are bit-identical to the in-memory PQ path:
    // pqTopK (iters=2, same params) over the same corpus agrees on ad2
    // for every id it returns (top-10 by ADC)
    val cand = IvfIndex.adcCandidates(spark, path, qvec,
      excludeId = Some(0L),
      nprobe = 4, refine = 10)
      .select($"vec_id", $"ad2").as[(Long, Double)].collect().toMap
    val inMem = SimilarityOps.pqTopK(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding",
      numSub = 4, kCodes = 4, iters = 2, k = 10)
      .select($"vec_id", $"ad2").as[(Long, Double)].collect().toMap
    assert(cand === inMem)

    // the first pass must be pruned along BOTH axes: partition filters
    // on the probed cells, and a read schema that has the codes column
    // but NOT the vector column
    val adc = IvfIndex.adcCandidates(spark, path, qvec,
      excludeId = Some(0L),
      nprobe = 2, refine = 50)
    val plan = adc.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      .filter(_.contains("codes"))
    assert(readSchemas.nonEmpty, plan)
    assert(readSchemas.forall(!_.contains("embedding")),
      s"ADC scan must not read vectors:\n$plan")
  }

  test("_meta sidecar: the index is self-describing, misuse fails fast") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfm_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
        residual = true)))
    assert(IvfIndex.readMeta(spark, path) === IvfIndex.Meta(
      "vec_id", "embedding", kCells = 4, dims = 64,
      Some(IvfIndex.Pq(4, 4, 2, residual = true))))

    // no meta -> no index: the query refuses instead of guessing columns
    val bare = d.getAbsolutePath + "/not_an_index"
    intercept[IllegalArgumentException] {
      IvfIndex.readMeta(spark, bare)
    }
    // a future layout version refuses instead of misreading
    val future = d.getAbsolutePath + "/future_index"
    new java.io.File(future).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$future/_meta"),
      """{"version":2,"idCol":"x","vecCol":"y","kCells":1,"dims":2,"pq":null}"""
        .getBytes)
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.readMeta(spark, future)
    }
    assert(ex.getMessage.contains("version 2"))
    // ADC serving against a plain (non-PQ) layout refuses
    val plainPath = d.getAbsolutePath + "/plain"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = plainPath)
    assert(IvfIndex.readMeta(spark, plainPath).pq.isEmpty)
    intercept[IllegalArgumentException] {
      IvfIndex.queryAdc(spark, plainPath, Array.fill(64)(0.5),
        excludeId = None, nprobe = 2, k = 5, refine = 10).collect()
    }
  }

  test("residual PQ layout: stored codes quantize vector-minus-centroid " +
    "residuals, ADC distances match a driver-side recomputation, and " +
    "full refine still recovers the exact IVF result") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfr_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
        residual = true)))

    // stored codes == pqEncode of independently-derived residuals against
    // the persisted subspace codebooks (a write that quantized RAW
    // vectors, or residuals against the wrong cell, fails here)
    val centArr = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (c, rs) => (c, rs.sortBy(_._2).map(_._3)) }
      .toDF("cell", "__centroid")
    val assigned = spark.read.parquet(s"$path/vectors")
      .select($"vec_id", $"cell", $"codes")
    val resid = emb.join(assigned.select($"vec_id", $"cell"), Seq("vec_id"))
      .join(broadcast(centArr), Seq("cell"))
      .select($"vec_id",
        zip_with($"embedding".cast("array<double>"), $"__centroid",
          (a, b) => a - b).as("rv"))
    val pqCb = spark.read.parquet(s"$path/pq_codebook")
      .as[(Int, Int, Int, Double)].collect().toSeq
    val expected = SimilarityOps.pqEncode(resid, "vec_id", "rv", pqCb)
      .as[(Long, Seq[Int])].collect().toMap
    val stored = assigned.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(stored === expected)

    // ADC first-pass distances == a from-scratch driver recomputation of
    // canonical IVFADC: per-cell query residual, per-term 12-dp round,
    // decimal accumulation, final 6-dp round — the same bits
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    val got = IvfIndex.adcCandidates(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, refine = 30)
      .select($"vec_id", $"cell", $"ad2")
      .as[(Long, Int, Double)].collect()
    val cbMap = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val pqMap = pqCb.groupBy(t => (t._1, t._2))
      .view.mapValues(_.sortBy(_._3).map(_._4)).toMap
    val codeMap = assigned.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    got.foreach { case (id, cell, ad2) =>
      val qr = qvec.zip(cbMap(cell)).map { case (q, c) => q - c }
      val want = codeMap(id).zipWithIndex.map { case (code, sub) =>
        val cw = pqMap((sub, code))
        cw.indices.map { dsub =>
          val diff = qr(sub * cw.length + dsub) - cw(dsub)
          BigDecimal(diff * diff)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      }.sum
      val wantD = BigDecimal(want.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ad2 === wantD, s"id=$id cell=$cell: ad2 $ad2 != $wantD")
    }

    // the refine contract is orthogonal to what was quantized
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    val exact = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10)
    val viaAdc = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10, refine = 10000)
    assert(rows(viaAdc) === rows(exact))

    // the per-(query, cell) residual tables must not cost the batch plan
    // its shape: both scans still partition-pruned, per-query refine
    // still a WindowGroupLimit, ADC pass still reads codes, not vectors
    val batch = IvfIndex.queryAdcBatch(spark, path,
      emb.filter($"vec_id" < 3), nprobe = 2, k = 10, refine = 50)
    val plan = batch.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findAllIn(plan).size >= 2,
      plan)
    assert(plan.contains("WindowGroupLimit"), plan)
    val codeSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      .filter(_.contains("codes"))
    assert(codeSchemas.nonEmpty && codeSchemas.forall(!_.contains("embedding")),
      s"residual ADC scan must not read vectors:\n$plan")

    // a query with the wrong dimensionality is an impossible state
    intercept[IllegalArgumentException] {
      IvfIndex.query(spark, path, Array(1.0, 2.0), excludeId = None,
        nprobe = 2, k = 10)
    }
  }

  test("filtered search on the COMPRESSED path: the predicate reaches " +
    "the codes scan as a PushedFilter, vectors still never read in the " +
    "first pass, and full-probe/full-refine filtered ADC == filtered " +
    "brute force") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivffa_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
        residual = true)))
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()

    val filtered = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10, refine = 10000, where = Some($"label" === 2))
    val got = filtered.select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = SimilarityOps.bruteForceTopK(
      emb.filter($"label" === 2), emb.filter($"vec_id" === 0),
      "vec_id", "embedding", 10)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)
    assert(got.size === 10, "selective predicate must not shrink k")

    // the predicate lands on the pruned CODES scan as a PushedFilter;
    // the first pass may read the predicate column but never the vectors
    val cand = IvfIndex.adcCandidates(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, refine = 50, where = Some($"label" === 2))
    val plan = cand.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).isDefined,
      plan)
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)
    val codeSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      .filter(_.contains("codes"))
    assert(codeSchemas.nonEmpty && codeSchemas.forall(!_.contains("embedding")),
      s"filtered ADC first pass must not read vectors:\n$plan")

    // batch form agrees under the same filter
    val batchGot = IvfIndex.queryAdcBatch(spark, path,
      emb.filter($"vec_id" === 0), nprobe = 4, k = 10, refine = 10000,
      where = Some($"label" === 2))
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(batchGot === got)
  }

  test("the driver-side codebook cache loads once across N single " +
    "queries and is invalidated by a rebuild") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfcc_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def ask() = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      nprobe = 2, k = 10)
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq

    // r21: write() pre-populates the stamped caches from the artifacts
    // the build already holds, so a build-then-serve JVM performs ZERO
    // physical codebook reads — N queries still share one cache entry
    val before = IvfIndex.codebookReads.get()
    val first = ask()
    (1 to 4).foreach(_ => assert(ask() === first))
    assert(IvfIndex.codebookReads.get() === before,
      "5 single queries after a same-JVM write must re-read nothing")

    // a cold cache (e.g. a serving JVM that didn't build) loads once
    IvfIndex.invalidateCache(path)
    (1 to 4).foreach(_ => assert(ask() === first))
    assert(IvfIndex.codebookReads.get() === before + 1,
      "cold-cache single queries against one index must load the codebook once")

    // a rebuild replaces the cached codebook with the NEW one (here
    // trained on half the corpus, so cells genuinely move)
    IvfIndex.write(emb.filter($"vec_id" < 250), "vec_id", "embedding",
      kCells = 4, trainIters = 2, path = path)
    val after = ask()
    assert(after.forall(_._1 < 250), "results must reflect the rebuilt index")
  }

  test("an out-of-band rebuild (another process, no invalidateCache) is " +
    "picked up by the _meta stamp — no stale codebook is ever served") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfoob_")
    d.deleteOnExit()
    val servePath = d.getAbsolutePath + "/index"
    val otherPath = d.getAbsolutePath + "/other"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = servePath)
    IvfIndex.write(emb.filter($"vec_id" < 250), "vec_id", "embedding",
      kCells = 4, trainIters = 2, path = otherPath)
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def ask() = IvfIndex.query(spark, servePath, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(ask().nonEmpty) // cache is now warm for servePath

    // simulate a rebuild by ANOTHER process: raw file replacement at the
    // serving path, no IvfIndex call in this JVM touches its caches
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles).foreach(_.foreach(c =>
          cp(c, new java.io.File(dst, c.getName))))
      } else {
        java.nio.file.Files.copy(src.toPath, dst.toPath): Unit
      }
    }
    val oldStamp = new java.io.File(servePath, "_meta").lastModified
    rm(new java.io.File(servePath))
    cp(new java.io.File(otherPath), new java.io.File(servePath))
    // force the stamp across ANY filesystem mtime granularity (a
    // same-second rebuild must still invalidate)
    assert(new java.io.File(servePath, "_meta")
      .setLastModified(oldStamp + 2000))

    val after = ask()
    assert(after.nonEmpty && after.forall(_ < 250),
      s"stale codebook served after an out-of-band rebuild: $after")
  }

  test("queryBatchChunked == queryBatch for a batch larger than maxBatch") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfch_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val queries = emb.filter($"vec_id" < 40)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Long, Int, Double, Int)].collect().sortBy(t => (t._1, t._5))
        .toSeq
    val whole = rows(IvfIndex.queryBatch(spark, path, queries,
      nprobe = 2, k = 5))
    val chunked = rows(IvfIndex.queryBatchChunked(spark, path, queries,
      nprobe = 2, k = 5, maxBatch = 16))
    assert(chunked === whole)
    // degenerate chunk sizes still agree
    assert(rows(IvfIndex.queryBatchChunked(spark, path, queries,
      nprobe = 2, k = 5, maxBatch = 1000)) === whole)

    // the ADC twin holds the same contract over a PQ layout
    val dp = tempDirFile("graft_ivfchp_")
    dp.deleteOnExit()
    val pqPath = dp.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = pqPath,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
        residual = true)))
    val wholeAdc = rows(IvfIndex.queryAdcBatch(spark, pqPath, queries,
      nprobe = 2, k = 5, refine = 20))
    val chunkedAdc = rows(IvfIndex.queryAdcBatchChunked(spark, pqPath,
      queries, nprobe = 2, k = 5, refine = 20, maxBatch = 16))
    assert(chunkedAdc === wholeAdc)

    // an empty query batch is an empty result, not an error
    assert(IvfIndex.queryBatchChunked(spark, path,
      queries.limit(0), nprobe = 2, k = 5, maxBatch = 16).count() === 0)
    assert(IvfIndex.queryBatch(spark, path,
      queries.limit(0), nprobe = 2, k = 5).count() === 0)
  }

  test("delete refuses to empty the entire index, and the layout stays " +
    "readable after the refusal") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)),
      (2L, Array(10.0f, 10.1f)), (3L, Array(10.1f, 9.9f)))
      .toDF("vec_id", "embedding")
    val d = tempDirFile("graft_ivfda_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(vecs, "vec_id", "embedding", kCells = 2, trainIters = 2,
      path = path)
    val ex = intercept[IllegalStateException] {
      IvfIndex.delete(spark, path, Seq(0L, 1L, 2L, 3L).toDF("vec_id"))
    }
    assert(ex.getMessage.contains("rebuild"))
    // nothing was mutated: all four rows still served
    assert(spark.read.parquet(s"$path/vectors").count() === 4)
  }

  test("compact clears a stale vectors_old leftover from a crashed " +
    "previous run and swaps cleanly") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfco_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb.filter($"vec_id" < 100), "vec_id", "embedding",
      kCells = 2, trainIters = 2, path = path)
    IvfIndex.append(spark, path, emb.filter($"vec_id" >= 100))
    // simulate the crash window: a fully-superseded vectors_old left behind
    val stale = new java.io.File(s"$path/vectors_old")
    assert(stale.mkdirs())
    val junk = new java.io.File(stale, "junk.bin")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))

    IvfIndex.compact(spark, path)

    assert(!stale.exists, "stale vectors_old must be cleared by the swap")
    assert(!new java.io.File(s"$path/vectors_compacting").exists)
    assert(spark.read.parquet(s"$path/vectors").count() === 500)
  }

  test("compact recovers a crash BETWEEN the swap renames: roll-forward " +
    "from vectors_compacting, roll-back from vectors_old") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfcr_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 2, trainIters = 2,
      path = path)
    val src = new java.io.File(s"$path/vectors")
    val tmp = new java.io.File(s"$path/vectors_compacting")
    val old = new java.io.File(s"$path/vectors_old")

    // crash state A (after rename 1, before the compacted copy landed —
    // tmp was already consumed or never completed): vectors is GONE, the
    // complete pre-compact layout sits in vectors_old — before the fix a
    // re-run died at spark.read.parquet(vectors) (ADVICE r10)
    assert(src.renameTo(old))
    IvfIndex.compact(spark, path) // must roll BACK from old, then compact
    assert(src.exists && !tmp.exists && !old.exists)
    assert(spark.read.parquet(s"$path/vectors").count() === 500)

    // crash state B: vectors gone, compacted copy complete in
    // vectors_compacting (crash right before the second rename)
    assert(src.renameTo(tmp))
    IvfIndex.compact(spark, path) // must roll forward from tmp, then compact
    assert(src.exists && !tmp.exists && !old.exists)
    assert(spark.read.parquet(s"$path/vectors").count() === 500)
  }

  test("chunked serving ignores extra caller columns — a query frame " +
    "carrying a __h column chunks on clean data (reserved-name collision)") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfhc_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val clean = emb.filter($"vec_id" < 12)
    // the collision case the advice flagged: withColumn REPLACES the
    // chunker's hash column, so before the narrowing fix every row
    // landed in one corrupt chunk group
    val dirty = clean
      .withColumn("__h", lit(999))
      .withColumn("__sub", lit(-1))
      .withColumn("extra", lit("x"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"vec_id", $"sim", $"rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    val want = rows(IvfIndex.queryBatch(spark, path, clean, nprobe = 2, k = 5))
    val got = rows(IvfIndex.queryBatchChunked(
      spark, path, dirty, nprobe = 2, k = 5, maxBatch = 5))
    assert(got === want)
  }

  test("IVF x SQ8: the codes-only first pass never reads vectors, " +
    "full probe + full refine == exact query, and append maintains codes") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfsq_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb.filter($"vec_id" < 400), "vec_id", "embedding",
      kCells = 4, trainIters = 2, path = path, sq8 = true)
    IvfIndex.append(spark, path, emb.filter($"vec_id" >= 400))
    assert(IvfIndex.readMeta(spark, path).sq8)
    // appended rows carry codes: no nulls anywhere in the layout
    assert(spark.read.parquet(s"$path/vectors")
      .filter($"sq8".isNull).count() === 0)

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    // full probe + refine >= corpus: must equal the exact path
    val sq8Full = IvfIndex.querySq8(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10, refine = 100000)
    assert(rows(sq8Full) === rows(IvfIndex.query(spark, path, qvec,
      excludeId = Some(0L), nprobe = 4, k = 10)))

    // an ACTIVE refine cut still recovers the exact top-10 here (SQ8
    // fidelity is near-exact on this fixture; deterministic, so pinned)
    val sq8Cut = IvfIndex.querySq8(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 10, refine = 30)
    assert(rows(sq8Cut) === rows(sq8Full))

    // the candidate pass reads codes, never the vector column: of the
    // two parquet scans in the plan, the sq8 one must not read embedding
    val plan = sq8Cut.queryExecution.executedPlan.toString
    val scanSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(scanSchemas.exists(s => s.contains("sq8") && !s.contains("embedding")),
      plan.take(4000))
    // and the scans are partition-pruned to the probed cells
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)

    // batch parity: a 1-row batch matches the single-query path
    val batch = IvfIndex.querySq8Batch(spark, path,
      emb.filter($"vec_id" === 0), nprobe = 4, k = 10, refine = 30)
      .select($"vec_id", $"cell", $"sim", $"rank")
      .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    assert(batch === rows(sq8Cut))

    // filtered vector search on the SQ8 path: full-probe filtered ==
    // filtered brute force over the corpus
    val filtered = IvfIndex.querySq8(spark, path, qvec, excludeId = Some(0L),
      nprobe = 4, k = 5, refine = 100000, where = Some($"label" === 2))
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = SimilarityOps.bruteForceTopK(
      emb.filter($"label" === 2), emb.filter($"vec_id" === 0),
      "vec_id", "embedding", 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(filtered === brute)
  }

  test("a FAILED PQ write still releases its corpus-scale checkpoint " +
    "(try/finally, not success-path-only)") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivffl_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // numSub=7 does not divide 64 dims: pqFit throws AFTER write() has
    // checkpointed the assignment join — the r10-advice leak window
    intercept[IllegalArgumentException] {
      IvfIndex.write(emb, "vec_id", "embedding", kCells = 2, trainIters = 2,
        path = path,
        pq = Some(IvfIndex.Pq(numSub = 7, kCodes = 4, iters = 1)))
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"failed write leaked checkpoint RDDs: ${after -- before}")
  }

  test("sampled training (trainPct) fits the codebook on EXACTLY the " +
    "restated md5 subset; encoding and serving stay full-corpus") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfsm_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path, trainPct = 40)

    // the persisted codebook is bit-equal to kmeansFit over the
    // independently restated sample — training really ran on the subset
    val sample = IvfIndex.trainSampleOf(emb, "vec_id", 40)
    val nSample = sample.count()
    assert(nSample > 0 && nSample < emb.count(),
      s"sample should be a proper subset, got $nSample rows")
    val (_, cent) = SimilarityOps.kmeansFit(
      sample, "vec_id", "embedding", 4, 2)
    val persisted = spark.read.parquet(s"$path/codebook")
      .as[(Int, Int, Double)].collect().toSeq.sorted
    assert(persisted === cent.sorted)

    // every corpus row was encoded (not just the sample)
    assert(spark.read.parquet(s"$path/vectors").count() === emb.count())

    // and full-probe serving is exact regardless of where the codebook
    // trained — the completeness contract
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .as[Array[Double]].head()
    val got = IvfIndex.query(spark, path, qvec, Some(0L), nprobe = 4, k = 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)

    intercept[IllegalArgumentException] {
      IvfIndex.write(emb, "vec_id", "embedding", kCells = 2, trainIters = 1,
        d.getAbsolutePath + "/bad", trainPct = 0)
    }
  }

  test("sampled RESIDUAL-PQ training (the v34 shape): coarse AND pq " +
    "codebooks are bit-equal to a full-train build over the restated " +
    "md5 sample, while encoding stays full-corpus") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfrs_")
    d.deleteOnExit()
    val sampled = d.getAbsolutePath + "/sampled"
    val restated = d.getAbsolutePath + "/restated"
    val pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
      residual = true))
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      sampled, pq = pq, trainPct = 40)
    // independently restate the training set and train on ALL of it:
    // same coarse fit (kmeansFit over the sample), same cells for the
    // sample rows, same residuals — both codebooks must agree
    // bit-for-bit if and only if v34's build really trained on the
    // sample
    val sample = IvfIndex.trainSampleOf(emb, "vec_id", 40)
    assert(sample.count() > 0 && sample.count() < emb.count())
    IvfIndex.write(sample, "vec_id", "embedding", kCells = 4,
      trainIters = 2, restated, pq = pq)
    def cb(p: String, name: String): Seq[Row] =
      spark.read.parquet(s"$p/$name").collect().toSeq
        .sortBy(_.toString)
    assert(cb(sampled, "codebook") === cb(restated, "codebook"))
    assert(cb(sampled, "pq_codebook") === cb(restated, "pq_codebook"))
    // encoding is full-corpus on the sampled build, sample-only on the
    // restated one
    assert(spark.read.parquet(s"$sampled/vectors").count() === emb.count())
    assert(spark.read.parquet(s"$restated/vectors").count() ===
      sample.count())
  }

  test("mergeFrom folds a shard into the destination: counts add up, " +
    "src cells re-derive under dst's codebook, misuse fails fast") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfmg_")
    d.deleteOnExit()
    val dst = d.getAbsolutePath + "/even"
    val src = d.getAbsolutePath + "/odd"
    val even = emb.filter($"vec_id" % 2 === 0)
    val odd = emb.filter($"vec_id" % 2 === 1)
    IvfIndex.write(even, "vec_id", "embedding", kCells = 3, trainIters = 2,
      dst, sq8 = true)
    IvfIndex.write(odd, "vec_id", "embedding", kCells = 3, trainIters = 2,
      src)
    IvfIndex.mergeFrom(spark, dst, src)

    // no rows lost, none duplicated
    val merged = spark.read.parquet(s"$dst/vectors")
    assert(merged.count() === emb.count())
    assert(merged.select($"vec_id").distinct().count() === emb.count())

    // every merged row sits in the cell DST's codebook assigns — the
    // src assignment (different codebook) must not leak through; and
    // merged sq8 codes come from dst's ranges even though src had none
    val centArrs = spark.read.parquet(s"$dst/codebook")
      .as[(Int, Int, Double)].collect().toSeq
    val expect = SimilarityOps.assignNearest(
      emb, "vec_id", "embedding", SimilarityOps.centroidArrays(centArrs))
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val gotCells = merged.select($"vec_id", $"cell")
      .as[(Long, Int)].collect().toMap
    assert(gotCells === expect)
    assert(merged.filter($"sq8".isNull).count() === 0)

    // full-probe serving over the merged index == brute force over all
    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .as[Array[Double]].head()
    val got = IvfIndex.query(spark, dst, qvec, Some(0L), nprobe = 3, k = 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    val brute = SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", 5)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(got === brute)

    // a layout disagreeing on columns/dims refuses
    val alien = d.getAbsolutePath + "/alien"
    IvfIndex.write(odd.withColumnRenamed("vec_id", "other_id"), "other_id",
      "embedding", kCells = 2, trainIters = 1, alien)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dst, alien)
    }
    assert(e.getMessage.contains("incompatible layouts"), e.getMessage)
  }

  test("write refuses a caller column named like a reserved layout " +
    "column instead of silently overwriting it") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfrs_")
    d.deleteOnExit()
    for (bad <- Seq("cell", "codes", "sq8", "__base")) {
      val e = intercept[IllegalArgumentException] {
        IvfIndex.write(emb.withColumn(bad, lit(1)), "vec_id", "embedding",
          kCells = 2, trainIters = 1, path = d.getAbsolutePath + s"/ix_$bad")
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }

  test("append/mergeFrom guards: reserved or drifting batch schemas and " +
    "self-merges fail fast instead of corrupting the layout") {
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfg_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val batch = emb.filter($"vec_id" < 5)
    // a reserved column on the batch would be overwritten (or collide
    // with the layout's own) — refuse
    intercept[IllegalArgumentException] {
      IvfIndex.append(spark, path, batch.withColumn("codes", lit(1)))
    }
    // a caller column the layout has never seen would drift the parquet
    // schema (served as nulls under some read orders) — refuse
    intercept[IllegalArgumentException] {
      IvfIndex.append(spark, path, batch.withColumn("extra", lit(1)))
    }
    // a missing caller column drifts the schema the other way — refuse
    intercept[IllegalArgumentException] {
      IvfIndex.append(spark, path, batch.drop("embedding"))
    }
    // self-merge passes every layout-compatibility check yet would
    // double every row — refuse on the qualified path, ./x vs x too
    intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, path, path)
    }
    // the guards rejected everything: the layout is bit-still
    assert(spark.read.parquet(s"$path/vectors").count() === 500)
  }

  test("a query plan built before delete/compact completes or fails " +
    "CLEANLY when the swap rewrites its cells — never a partial answer; " +
    "a re-planned retry always matches brute force (ADVICE r12)") {
    // At 100 TB serving and maintenance overlap: delete dynamically
    // overwrites the affected cell partitions and compact swaps the
    // whole vectors dir, so a plan holding the old file listing loses
    // its files mid-flight. The contract: clean missing-file failure
    // (retry-safe), or a complete answer for ONE generation.
    val emb = Tables(spark, dir, "embeddings")
    val d = tempDirFile("graft_ivfrace_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)
    val qvec = emb.filter($"vec_id" === 300)
      .select($"embedding".cast("array<double>")).as[Array[Double]].head()
    def topIds(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id").as[Long].collect().toSeq
    def brute(excluded: Seq[Long]) = topIds(
      graft.operators.SimilarityOps.bruteForceTopK(
        emb.filter(!$"vec_id".isin((300L +: excluded): _*)),
        emb.filter($"vec_id" === 300), "vec_id", "embedding", 10))
    def cleanFailure(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
        .exists(t => t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage).exists(m =>
            m.contains("does not exist") || m.contains("FileNotFound")))

    // -- delete overwrites the victims' cells under the held plan
    val preDelete = IvfIndex.query(spark, path, qvec,
      excludeId = Some(300L), nprobe = 4, k = 10)
    val doomed = brute(Nil).take(3) // guaranteed to intersect the top-k
    IvfIndex.delete(spark, path, doomed.toDF("vec_id"))
    scala.util.Try(topIds(preDelete)) match {
      case scala.util.Success(got) =>
        assert(got === brute(Nil) || got === brute(doomed), got.toString)
      case scala.util.Failure(e) => assert(cleanFailure(e), e.toString)
    }
    val retry = IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)
    assert(topIds(retry) === brute(doomed))

    // -- compact swaps the whole generation under the held plan;
    //    content is preserved, so a survivor must answer identically
    val preCompact = IvfIndex.query(spark, path, qvec,
      excludeId = Some(300L), nprobe = 4, k = 10)
    IvfIndex.compact(spark, path)
    scala.util.Try(topIds(preCompact)) match {
      case scala.util.Success(got) => assert(got === brute(doomed))
      case scala.util.Failure(e) => assert(cleanFailure(e), e.toString)
    }
    assert(topIds(IvfIndex.query(spark, path, qvec, excludeId = Some(300L),
      nprobe = 4, k = 10)) === brute(doomed))
  }
}
