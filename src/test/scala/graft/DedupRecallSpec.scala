package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Measured candidate quality of the LSH blocking stage against exact
  * ground truth — the dedup twin of AnnRecallSpec. All hashing is
  * deterministic (md5), so these are exact pins, not statistical
  * floors: the fixture's 28 planted near-dup pairs (jaccard >= 0.5)
  * must ALL surface as candidates (recall 1.0 — LSH misses here would
  * mean a banding bug, not bad luck), and the false-candidate mass
  * stays small enough that the verify stage's cost is bounded
  * (precision >= 0.7 at the loose 0.3 cut; the exact-Jaccard verify
  * then removes every sub-threshold survivor by construction).
  */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH blocking: recall 1.0 on the 28 true pairs, bounded " +
    "false-candidate mass, and verify-stage exactness") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cands = DedupOps.minhashCandidatePairs(
      docs, "doc_id", "text", shingleK = 3, numPerm = 8, bands = 2)
      .select($"a", $"b").as[(Long, Long)].collect().toSet

    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val allPairs = ids.combinations(2).map(x => (x(0), x(1))).toSeq
      .toDF("a", "b")
    val truth = DedupOps.ngramJaccard(allPairs, docs, "doc_id", "text", 3)
      .where($"jaccard" >= 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet

    assert(truth.size === 28, s"fixture drifted: ${truth.size} true pairs")
    assert(truth.subsetOf(cands),
      s"LSH missed true pairs: ${truth.diff(cands)}")
    assert(cands.size <= 45, // measured 38; headroom, not a target
      s"candidate blowup: ${cands.size}")

    // verify stage: exact jaccard over candidates keeps exactly the
    // truth set at the 0.5 cut (no false survivor, no true loss)
    val verified = DedupOps.ngramJaccard(
      cands.toSeq.toDF("a", "b"), docs, "doc_id", "text", 3)
      .where($"jaccard" >= 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(verified === truth)

    // precision at the loose 0.3 cut — bounded verify-stage waste
    val loose = DedupOps.ngramJaccard(
      cands.toSeq.toDF("a", "b"), docs, "doc_id", "text", 3)
      .where($"jaccard" >= 0.3).count()
    assert(loose.toDouble / cands.size >= 0.7,
      s"precision@0.3 = ${loose.toDouble / cands.size}")
  }
}
