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
}
