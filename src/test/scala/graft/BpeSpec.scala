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

  test("driver-loop trainer == per-round-job trainer, merge for merge " +
    "(rank, pair, weighted count), on a real corpus slice") {
    // VERDICT r15 item 4: bpeTrain now runs the merge loop driver-side
    // over the collected word table; the pre-r16 one-Spark-job-per-round
    // form is the distributed cross-check. 120 merges exercises many
    // rounds of incremental pair-count maintenance, merge-symbol
    // references, and tie-breaks on the word-salad vocabulary.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val driver = TextOps.bpeTrain(d, "text", numMerges = 120)
    val jobs = TextOps.bpeTrainPerRoundJobs(d, "text", numMerges = 120)
    assert(driver === jobs,
      "driver-side merge loop must reproduce the per-round-job trainer " +
        "exactly (same pairs, same ranks, same selection-time counts)")
    // synthetic adversarial vocabulary: overlapping runs + cross-word
    // ties the real corpus may not produce
    val tricky = docs("aaa aab aba abab baba bb bb", "aaaa ab ba baab")
    val dt = TextOps.bpeTrain(tricky, "text", numMerges = 30)
    val jt = TextOps.bpeTrainPerRoundJobs(tricky, "text", numMerges = 30)
    assert(dt === jt)
  }

  test("lazy-heap argmax == O(|pairs|) scan argmax, merge for merge, on " +
    "real and adversarial vocabularies (VERDICT r16 item 1)") {
    // the heap path is the default inside bpeTrain; this pins it against
    // the retained scan on the same collected vocabulary — stale-entry
    // discards, duplicate pushes after down-up count cancels, and the
    // (count desc, key asc) tie-break must all be invisible
    def vocabOf(texts: String*): Array[(Array[Int], Long)] = {
      val d = docs(texts: _*)
      TextOps.bpeWordTable(d, "text").as[(String, Long)].collect()
        .map { case (w, c) => (w.codePoints().toArray, c) }
    }
    val realVocab = TextOps.bpeWordTable(
      Tables(spark, "/root/testdata/sf0.001", "documents"), "text")
      .as[(String, Long)].collect()
      .map { case (w, c) => (w.codePoints().toArray, c) }
    assert(realVocab.nonEmpty) // fixture sanity
    assert(
      TextOps.bpeTrainDriver(realVocab.map { case (s, c) => (s.clone(), c) },
        120, argmaxViaHeap = true) ===
      TextOps.bpeTrainDriver(realVocab.map { case (s, c) => (s.clone(), c) },
        120, argmaxViaHeap = false))
    val tricky = vocabOf("aaa aab aba abab baba bb bb aaaa ab ba baab")
    assert(
      TextOps.bpeTrainDriver(tricky.map { case (s, c) => (s.clone(), c) },
        30, argmaxViaHeap = true) ===
      TextOps.bpeTrainDriver(tricky.map { case (s, c) => (s.clone(), c) },
        30, argmaxViaHeap = false))
  }

  test("sharded trainer == driver-loop trainer, merge for merge, on a " +
    "real corpus slice and adversarial fixtures; partitioning- and " +
    "checkpoint-interval-invariant (VERDICT r19 item 1)") {
    // bpeTrainSharded keeps the word table on the executors and ships
    // only per-partition pair-count deltas to the driver — semantics
    // must be indistinguishable from the driver loop: same pairs, same
    // ranks, same selection-time counts, same early stop. 120 merges on
    // the word-salad corpus runs the vocabulary DRY (~90 merges), so
    // the early-stop path is exercised too.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val driver = TextOps.bpeTrain(d, "text", numMerges = 120)
    val sharded = TextOps.bpeTrainSharded(d, "text", numMerges = 120)
    assert(sharded === driver,
      "sharded trainer must reproduce the driver loop exactly")
    // adversarial overlaps/ties + a checkpoint interval that forces
    // several mid-run localCheckpoints (lineage truncation must not
    // perturb results)
    val tricky = docs("aaa aab aba abab baba bb bb", "aaaa ab ba baab")
    val dt = TextOps.bpeTrain(tricky, "text", numMerges = 30)
    assert(TextOps.bpeTrainSharded(tricky, "text", 30) === dt)
    assert(TextOps.bpeTrainSharded(tricky, "text", 30,
      checkpointInterval = 7) === dt)
    // reliable (fault-tolerant) checkpoints: same merges, and the mode
    // refuses loudly without a checkpoint dir (round-20 self-review:
    // localCheckpoint-truncated lineage cannot survive block loss on a
    // multi-hour cluster run — the reliable path is the shipped answer)
    val hadDir = spark.sparkContext.getCheckpointDir
    if (hadDir.isEmpty)
      intercept[IllegalArgumentException] {
        TextOps.bpeTrainSharded(tricky, "text", 30,
          checkpointInterval = 7, reliableCheckpoints = true)
      }
    else
      // shared-session ordering artifact: some earlier suite set a dir,
      // so the refusal branch is untestable THIS run — say so instead
      // of vanishing silently (round-20 self-review)
      info("refusal branch skipped: a checkpoint dir was already set")
    // tempDir, not a raw createTempDirectory: checkpoint files fill the
    // dir, and deleteOnExit-style cleanup no-ops on non-empty dirs
    // (ADVICE r13) — the helper's shutdown hook actually removes it
    spark.sparkContext.setCheckpointDir(tempDir("bpe-sharded-ck"))
    val reliableRun = TextOps.bpeTrainSharded(tricky, "text", 30,
      checkpointInterval = 7, reliableCheckpoints = true)
    assert(reliableRun === dt,
      "reliable checkpoints must not perturb training")
    // partitioning invariance: per-partition delta maps merge by exact
    // Long sums, so shard boundaries cannot show through
    assert(TextOps.bpeTrainSharded(d.repartition(13), "text", 40) ===
      TextOps.bpeTrain(d, "text", 40))
    // minCount floors on the distributed side too
    val fl = docs("ab ab ab cd cd zz")
    assert(TextOps.bpeTrainSharded(fl, "text", 2, minCount = 2L) ===
      TextOps.bpeTrain(fl, "text", 2, minCount = 2L))
  }

  test("sharded-trainer helpers: greedy rewrite and exact multiset " +
    "deltas on hand-computed overlap cases; reliable-checkpoint GC " +
    "leaves the checkpoint dir empty after training") {
    def cps(s: String): Array[Int] = s.codePoints().toArray
    val z = 'Z'.toInt
    // leftmost-non-overlapping: aaaa -> ZZ, aaa -> Za (the driver
    // loop's and bpeApplyCol's greedy order)
    assert(TextOps.bpeRewritePair(cps("aaaa"), 'a', 'a', z).toSeq ===
      cps("ZZ").toSeq)
    assert(TextOps.bpeRewritePair(cps("aaa"), 'a', 'a', z).toSeq ===
      cps("Za").toSeq)
    assert(TextOps.bpeRewritePair(cps("xaby"), 'a', 'b', z).toSeq ===
      cps("xZy").toSeq)
    // exact multiset delta at weight 3: aaaa has overlapping pairs
    // {aa:3}; ZZ has {ZZ:1} -> delta {aa:-9, ZZ:+3}
    def key(a: Int, b: Int): Long = (a.toLong << 21) | b.toLong
    def deltaMap(oldS: String, newS: String, w: Long): Map[Long, Long] = {
      val d = TextOps.bpePairDelta(cps(oldS), cps(newS), w)
      (0 until d.length by 2).map(i => d(i) -> d(i + 1)).toMap
    }
    assert(deltaMap("aaaa", "ZZ", 3L) ===
      Map(key('a', 'a') -> -9L, key('Z', 'Z') -> 3L))
    // back-to-back sites with survivors both sides: xababy -> xZZy
    assert(deltaMap("xababy", "xZZy", 1L) === Map(
      key('x', 'a') -> -1L, key('a', 'b') -> -2L, key('b', 'a') -> -1L,
      key('b', 'y') -> -1L, key('x', 'Z') -> 1L, key('Z', 'Z') -> 1L,
      key('Z', 'y') -> 1L))
    // pairs unchanged by the rewrite cancel to ZERO entries (nonzero-
    // only contract)
    assert(deltaMap("ab", "ab", 5L) === Map.empty)
    // reliable-checkpoint GC: superseded generations are deleted on
    // supersession and the last on completion — after a multi-
    // checkpoint run the dir holds no rdd data (round-20 self-review:
    // without the GC a 32k-merge run keeps ~500 word-table copies)
    val gcDir = java.nio.file.Files.createTempDirectory("bpe-ck-gc")
    SparkSpec.registerForCleanup(gcDir)
    spark.sparkContext.setCheckpointDir(gcDir.toString)
    val d = docs("aaa aab aba abab baba bb bb", "aaaa ab ba baab")
    TextOps.bpeTrainSharded(d, "text", 30,
      checkpointInterval = 5, reliableCheckpoints = true)
    import scala.jdk.CollectionConverters._
    val leftover = java.nio.file.Files.walk(gcDir).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_)).toSeq
    assert(leftover.isEmpty,
      s"checkpoint store must be empty after training, found: $leftover")
  }

  test("bpeWordTable minCount floors the vocabulary before it reaches " +
    "the driver; counts of surviving words are unchanged") {
    val d = docs("ab ab ab cd cd zz")
    val full = TextOps.bpeWordTable(d, "text")
      .as[(String, Long)].collect().toMap
    assert(full === Map("ab" -> 3L, "cd" -> 2L, "zz" -> 1L))
    val floored = TextOps.bpeWordTable(d, "text", minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(floored === Map("ab" -> 3L, "cd" -> 2L),
      "hapax tail must be dropped, surviving counts untouched")
    // threaded through bpeTrain: with zz gone, training sees only ab/cd
    val merges = TextOps.bpeTrain(d, "text", numMerges = 2, minCount = 2L)
    assert(merges.map(_._2) === Seq("ab", "cd"))
    assert(merges.map(_._3) === Seq(3L, 2L))
    intercept[IllegalArgumentException] {
      TextOps.bpeWordTable(d, "text", minCount = 0L)
    }
  }

  test("merge ranks past 6400 use supplementary private-use symbols: " +
    "surface expansion and tokenization stay code-point-correct") {
    // the cap is now BpeMaxMerges (137,468 >= the 32k production shape);
    // ranks > 6400 mint SUPPLEMENTARY code points (surrogate pairs in
    // the JVM). Training 6,401 real merges in a unit test is pointless —
    // instead pin the machinery the high ranks ride: a synthetic merge
    // table whose rank-7000 symbol must round-trip through
    // bpeSurfaceForms (code-point iteration) and bpeTokens (split("")
    // yields code points, map lookup by surrogate-pair string).
    assert(TextOps.BpeMaxMerges >= 32000)
    val merges = Seq(
      (1, "ab", 10L),
      (7000, "c" + (0xE000).toChar, 5L)) // pair references merge 1's char
    val surfaces = TextOps.bpeSurfaceForms(merges)
    assert(surfaces(1) === "ab")
    assert(surfaces(7000) === "cab")
    val d = docs("cab cab x")
    val toks = d
      .select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("cab", "cab", "x"),
      "a supplementary-plane merge symbol must tokenize as ONE token")
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

  test("driver-heap pre-flight refuses BEFORE the merge loop commits, " +
    "recommends a concrete minCount floor, and heapGuard = false " +
    "overrides (VERDICT r18 item 3)") {
    val d = docs("alpha beta gamma alpha beta alpha", "delta alpha beta")
    // a 1 KB budget no vocabulary fits: the guard must throw with the
    // fix in the message (floor + driver memory + the override), not
    // let the loop run
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeTrain(d, "text", numMerges = 2, heapBudgetBytes = 1024L)
    }
    assert(e.getMessage.contains("minCount >=") &&
      e.getMessage.contains("SPARK_DRIVER_MEM") &&
      e.getMessage.contains("heapGuard"),
      s"the refusal must carry its own fix, got: ${e.getMessage}")
    // override: same call trains normally and matches the default-guard
    // result merge for merge
    val forced = TextOps.bpeTrain(d, "text", numMerges = 2,
      heapGuard = false, heapBudgetBytes = 1024L)
    assert(forced === TextOps.bpeTrain(d, "text", numMerges = 2),
      "the override must only skip the guard, never change training")
    // the model is calibrated to BPE_BOUNDARY_r18's measured point:
    // 10M words x ~32 code points -> ~55 GB estimated vs ~59 GB live
    val est = TextOps.bpeDriverHeapEstimate(10000000L, 320000000L)
    assert(est > 50e9.toLong && est < 60e9.toLong,
      s"estimate must stay calibrated to the measured boundary, got $est")
    // ADVICE r19: the merge-accumulated term scales with the merge
    // budget — a 2000-merge training on the same 10M-word vocabulary
    // must not be priced as the full 32k-merge calibration run (the
    // flat model falsely refused small-budget trainings), while the
    // merge-independent base (symbol arrays + initial pair index) and
    // the per-word floor never scale away
    val estSmall = TextOps.bpeDriverHeapEstimate(10000000L, 320000000L, 2000)
    assert(estSmall < est / 2,
      s"small merge budgets must shrink the estimate, got $estSmall vs $est")
    assert(estSmall > 48L * 320000000L + 200L * 10000000L,
      s"the merge-independent base must survive, got $estSmall")
    // FLAT count distribution (every word once): no floor can shrink
    // the vocabulary — the refusal must say so rather than recommend
    // a floor that would keep zero words (round-19 self-review: the
    // first cut's floorAt+1 recommendation emptied flat vocabularies)
    val flat = docs("aa bb cc dd", "ee ff gg hh")
    val e2 = intercept[IllegalArgumentException] {
      TextOps.bpeTrain(flat, "text", numMerges = 2, heapBudgetBytes = 1024L)
    }
    assert(e2.getMessage.contains("too flat") &&
      !e2.getMessage.contains("minCount >="),
      s"flat distributions must not get a floor recommendation, got: " +
        e2.getMessage)
  }
}
