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
