package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Trained BPE: classic get_stats/merge semantics on a corpus small
  * enough to verify by hand, plus determinism and degenerate cases.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("merges pick the most frequent weighted pair, ties to the " +
    "lexicographically smallest, and later merges reference earlier ones") {
    // vocabulary: "abab" x4, "ab" x2 -> overlapping pair counts:
    // ab = 4*2 + 2*1 = 10, ba = 4*1 = 4
    val d = docs("abab abab ab", "abab ab abab")
    val merges = TextOps.bpeTrain(d, "text", numMerges = 2)
    val surfaces = TextOps.bpeSurfaceForms(merges)
    assert(merges.head._2 === "ab" && merges.head._3 === 10L)
    assert(surfaces(1) === "ab")
    // after merge 1: "abab" -> m1 m1 (x4), "ab" -> m1 (x2); the only
    // remaining pair is (m1, m1) with weight 4 -> surface "abab"
    assert(surfaces(2) === "abab")
    assert(merges(1)._3 === 4L)
  }

  test("application is greedy leftmost non-overlapping: 'aaa' under " +
    "merge (aa) tokenizes to [aa, a]") {
    val d = docs("aaa aaa aa")
    val merges = TextOps.bpeTrain(d, "text", numMerges = 1)
    assert(merges.head._2 === "aa")
    val toks = d.limit(1)
      .select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("aa", "a", "aa", "a", "aa"))
  }

  test("training stops early when no two-symbol word remains, and an " +
    "empty merge table tokenizes to characters") {
    val d = docs("a b c a b")
    val merges = TextOps.bpeTrain(d, "text", numMerges = 5)
    assert(merges.isEmpty)
    val toks = d.select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("a", "b", "c", "a", "b"))
  }

  test("training is partitioning-invariant and tokenization preserves " +
    "the character stream") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val m1 = TextOps.bpeTrain(d, "text", numMerges = 3)
    val m2 = TextOps.bpeTrain(d.repartition(13), "text", numMerges = 3)
    assert(m1 === m2, "merge table must not depend on partitioning")

    // concatenating a doc's tokens reproduces its whitespace-stripped text
    val rows = d.limit(20)
      .select(col("text"), TextOps.bpeTokens(col("text"), m1).as("t"))
      .as[(String, Seq[String])].collect()
    rows.foreach { case (text, toks) =>
      assert(toks.mkString === text.split("\\s+").filter(_.nonEmpty).mkString,
        "token stream must losslessly cover the text")
    }
  }
}
