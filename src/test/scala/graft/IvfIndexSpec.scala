package graft

import graft.operators.{IvfIndex, SimilarityOps}
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
    val d = java.nio.file.Files.createTempDirectory("graft_ivf_").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val qvec = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .as[Array[Double]].head()
    val fromIndex = IvfIndex.query(spark, path, qvec, excludeId = Some(0L),
      "vec_id", "embedding", nprobe = 2, k = 10)
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

  test("queryBatch == a per-query loop of single queries; the batch scan " +
    "prunes to the union of probed cells and group-limits per query") {
    val emb = Tables(spark, dir, "embeddings")
    val d = java.nio.file.Files.createTempDirectory("graft_ivfb_").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(emb, "vec_id", "embedding", kCells = 4, trainIters = 2,
      path = path)

    val qids = Seq(0L, 250L, 499L)
    val batch = IvfIndex.queryBatch(spark, path,
      emb.filter($"vec_id".isin(qids: _*)), "vec_id", "embedding",
      nprobe = 2, k = 10)
    val got = batch.select($"qid", $"vec_id", $"cell", $"sim", $"rank")
      .as[(Long, Long, Int, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4, t._5))
        .sortBy(_._4).toSeq).toMap

    qids.foreach { qid =>
      val qvec = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).as[Array[Double]].head()
      val single = IvfIndex.query(spark, path, qvec, excludeId = Some(qid),
        "vec_id", "embedding", nprobe = 2, k = 10)
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

  test("IVF x PQ: queryAdc == query at full refine; the ADC pass is " +
    "partition-pruned and reads codes, never vectors") {
    val emb = Tables(spark, dir, "embeddings")
    val d = java.nio.file.Files.createTempDirectory("graft_ivfpq_").toFile
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
      "vec_id", "embedding", nprobe = 2, k = 10)
    val viaAdc = IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(0L),
      "vec_id", "embedding", nprobe = 2, k = 10, refine = 10000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cell", $"sim", $"rank")
        .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toSeq
    assert(rows(viaAdc) === rows(exact))

    // candidate distances are bit-identical to the in-memory PQ path:
    // pqTopK (iters=2, same params) over the same corpus agrees on ad2
    // for every id it returns (top-10 by ADC)
    val cand = IvfIndex.adcCandidates(spark, path, qvec,
      excludeId = Some(0L), "vec_id", "embedding", nprobe = 4, refine = 10)
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
      excludeId = Some(0L), "vec_id", "embedding", nprobe = 2, refine = 50)
    val plan = adc.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.*(IN|in)".r.findFirstIn(plan).isDefined,
      plan)
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      .filter(_.contains("codes"))
    assert(readSchemas.nonEmpty, plan)
    assert(readSchemas.forall(!_.contains("embedding")),
      s"ADC scan must not read vectors:\n$plan")
  }
}
