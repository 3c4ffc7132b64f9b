package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: code range, reconstruction error bound,
  * and ranking fidelity against the exact brute force.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("codes are 0..255 ints, constant dims encode 0, and encoding is " +
    "partitioning-invariant") {
    val emb = Tables(spark, dir, "embeddings")
    val mm = SimilarityOps.sq8Fit(emb, "embedding")
    assert(mm.size === 64)
    mm.foreach { case (mn, mx) => assert(mn <= mx) }
    val codes = emb
      .select(SimilarityOps.sq8EncodeCol($"embedding", mm).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= 0 && c <= 255)))
    // every dim range is actually exercised: some 0 and some 255 appear
    // (min and max rows encode to the endpoints by construction)
    assert(codes.flatten.contains(0) && codes.flatten.contains(255))

    val reparted = emb.repartition(7)
      .select($"vec_id", SimilarityOps.sq8EncodeCol($"embedding", mm).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val byId = emb
      .select($"vec_id", SimilarityOps.sq8EncodeCol($"embedding", mm).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(reparted === byId, "codes must not depend on partitioning")

    // constant dimension -> flat range -> code 0, dequant returns min
    val tiny = Seq((0L, Array(1.5f, 2.0f)), (1L, Array(1.5f, 4.0f)))
      .toDF("vec_id", "embedding")
    val tmm = SimilarityOps.sq8Fit(tiny, "embedding")
    assert(tmm.head._1 === tmm.head._2)
    val tcodes = tiny
      .select(SimilarityOps.sq8EncodeCol($"embedding", tmm).as("c"))
      .as[Seq[Int]].collect()
    assert(tcodes.forall(_.head === 0))
  }

  test("dequantization error is bounded by half a quantization step per dim") {
    val emb = Tables(spark, dir, "embeddings")
    val mm = SimilarityOps.sq8Fit(emb, "embedding")
    val pairs = emb.select(
      $"embedding".cast("array<double>").as("v"),
      SimilarityOps.sq8DequantCol(
        SimilarityOps.sq8EncodeCol($"embedding", mm), mm).as("vhat"))
      .as[(Seq[Double], Seq[Double])].collect()
    pairs.foreach { case (v, vhat) =>
      v.indices.foreach { i =>
        val (mn, mx) = mm(i)
        val halfStep = (mx - mn) / 255.0 / 2.0
        assert(math.abs(v(i) - vhat(i)) <= halfStep + 1e-9,
          s"dim $i: ${v(i)} vs ${vhat(i)} exceeds half-step $halfStep")
      }
    }
  }

  test("sq8TopK ranking fidelity: measured overlap@10 with exact brute " +
    "force holds its floor") {
    val emb = Tables(spark, dir, "embeddings")
    def top10(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val qids = Seq(0L, 100L, 250L)
    val overlaps = qids.map { qid =>
      val exact = top10(SimilarityOps.bruteForceTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding", 10))
      val sq8 = top10(SimilarityOps.sq8TopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding", 10))
      (sq8.toSet intersect exact.toSet).size
    }
    info(s"overlap@10 per query: ${qids.zip(overlaps)}")
    // deterministic fixture: measured once, pinned exactly
    assert(overlaps.forall(_ >= 9), s"overlap@10 regressed: $overlaps")
  }
}
