package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalPick: winner by quality, ties to lowest id, singletons " +
    "keep themselves") {
    // cluster {1,2,3} via edges; {5,6} via one edge; 4 and 7 unclustered
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), // winner: 2 (quality tie 2 vs 3)
      (4L, 0.1),
      (5L, 0.3), (6L, 0.2), // winner: 5
      (7L, 0.8))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = DedupOps.canonicalPick(docs, "doc_id", col("q"), pairs)
      .select(col("doc_id"), col("component"), col("is_canonical"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((1L, false)))
    assert(out(2L) === ((1L, true)))
    assert(out(3L) === ((1L, false)))
    assert(out(4L) === ((4L, true))) // singleton: own cluster, canonical
    assert(out(5L) === ((5L, true)))
    assert(out(6L) === ((5L, false)))
    assert(out(7L) === ((7L, true)))
    // exactly one canonical per cluster: {1,2,3}, {5,6}, {4}, {7}
    assert(out.values.count(_._2) === 4)
  }

  test("semanticDedup links near-identical vectors, leaves the rest alone") {
    // 0 and 1 are near-parallel (cosine ~1), 2 is orthogonal-ish; 3 is in
    // another group so it can never link to 0/1 regardless of similarity
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.01f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = DedupOps.semanticDedup(emb, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) === ((0L, true)))
    assert(out(1L) === ((0L, false))) // clustered under 0, not canonical
    assert(out(2L) === ((2L, true))) // below tau -> singleton
    assert(out(3L) === ((3L, true))) // other group -> singleton
  }

  test("paragraphDedup: global first occurrence wins, within-doc repeats " +
    "collapse, emptied docs survive, plan pre-reduces before the shuffle") {
    val docs = Seq(
      (1L, "alpha|beta|alpha"), // within-doc repeat of alpha
      (2L, "beta|gamma"),       // beta already taken by doc 1
      (3L, "alpha|beta"))       // loses everything
      .toDF("doc_id", "text")
    val out = DedupOps.paragraphDedup(docs, "doc_id", "text", "\\|", "|")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 3, 2, "alpha|beta"),
      (2L, 2, 1, "gamma"),
      (3L, 2, 0, "")))
    // the rank-1 window must compile to WindowGroupLimit so each map
    // partition sends at most one candidate per paragraph hash
    val plan = DedupOps.paragraphDedup(docs, "doc_id", "text", "\\|", "|")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    intercept[IllegalArgumentException] {
      DedupOps.paragraphDedup(
        docs.withColumn("pos", lit(1)), "doc_id", "text", "\\|", "|")
    }
  }

  test("boilerplateRemoval: >=minDocs paragraphs go everywhere, rare " +
    "within-doc repeats survive, emptied docs come back empty, per-group " +
    "scoping counts frequency inside the group only") {
    val docs = Seq(
      (1L, "nav|body1|nav"),  // nav is boilerplate (docs 1,2,3); repeat dies too
      (2L, "nav|body2"),
      (3L, "nav"),            // all boilerplate -> empty
      (4L, "rare|rare|body4")) // within-doc repeat of a df=1 para survives
      .toDF("doc_id", "text")
    val out = DedupOps.boilerplateRemoval(
      docs, "doc_id", "text", "\\|", "|", minDocs = 2)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 3, 1, "body1"),
      (2L, 2, 1, "body2"),
      (3L, 1, 0, ""),
      (4L, 3, 3, "rare|rare|body4")))
    // per-group scoping: "hdr" is boilerplate inside source A only; the
    // single B occurrence survives
    val grouped = Seq(
      (1L, "A", "hdr|a1"), (2L, "A", "hdr|a2"), (3L, "B", "hdr|b1"))
      .toDF("doc_id", "src", "text")
    val g = DedupOps.boilerplateRemoval(
      grouped, "doc_id", "text", "\\|", "|", minDocs = 2,
      groupCol = Some("src"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(g === Seq(
      (1L, 2, 1, "a1"), (2L, 2, 1, "a2"), (3L, 2, 2, "hdr|b1")))
    intercept[IllegalArgumentException] {
      DedupOps.boilerplateRemoval(docs, "doc_id", "text", "\\|", "|", 1)
    }
    intercept[IllegalArgumentException] {
      DedupOps.boilerplateRemoval(
        docs.withColumn("para", lit(1)), "doc_id", "text", "\\|", "|", 2)
    }
  }

  test("labelPropagation: bridged triangles stay two communities " +
    "(where CC merges them), hand-replicated 3-round trajectory, " +
    "edge-order invariant") {
    // two triangles {1,2,3} and {4,5,6} joined by the single bridge
    // 3-4 — the exact topology where CC over-merges and LPA holds
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val out = DedupOps.labelPropagation(pairs, iters = 3)
      .as[(Long, Long)].collect().toMap
    // hand-replayed deterministic LPA (most-frequent neighbor label,
    // ties to smallest): r1 = (2,1,1,3,4,4), r2 = (1,1,1,4,3,3),
    // r3 converges to the two triangles
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // CC on the same pairs merges everything — the contrast is the point
    val cc = DedupOps.connectedComponents(pairs)
      .select("component").distinct().count()
    assert(cc === 1L)
    // edge order and orientation must not change the outcome
    val shuffled = Seq((4L, 3L), (6L, 5L), (6L, 4L), (5L, 4L),
      (3L, 2L), (3L, 1L), (2L, 1L)).toDF("a", "b")
    val out2 = DedupOps.labelPropagation(shuffled, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out2 === out)
  }

  test("pagerankPick: the hub outranks leaves, symmetric ties break to " +
    "the lowest id, one authority per component, hand-replicated ranks") {
    // path 1-2-3 (2 is the hub) plus the symmetric pair 4-5
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = DedupOps.pagerankPick(pairs, damping = 0.85, iters = 3)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    // replicate the arithmetic contract exactly: contributions round
    // 12 dp and sum, ranks re-round 9 dp per iteration
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0, 4L -> 1.0, 5L -> 1.0)
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L),
      4L -> Seq(5L), 5L -> Seq(4L))
    var pr = deg.keys.map(_ -> r9(1.0 / 5.0)).toMap
    for (_ <- 1 to 3) {
      val c = pr.keys.map { i =>
        i -> (BigDecimal(0) /: nbrs(i)) { (acc, j) =>
          acc + BigDecimal(r12(pr(j) / deg(j)))
        }
      }.toMap
      pr = pr.keys.map { i =>
        i -> r9((1.0 - 0.85) / 5.0 + 0.85 * c(i).toDouble)
      }.toMap
    }
    assert(out.map(r => r._1 -> r._3).toMap === pr)
    // hub wins its component; the symmetric pair ties to the lowest id
    assert(out.map(r => r._1 -> r._4).toMap ===
      Map(1L -> false, 2L -> true, 3L -> false, 4L -> true, 5L -> false))
    assert(out.count(_._4) === 2) // one authority per component
    assert(out.forall(r => if (r._1 <= 3) r._2 === 1L else r._2 === 4L))
    intercept[IllegalArgumentException] {
      DedupOps.pagerankPick(pairs, damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      DedupOps.pagerankPick(pairs, iters = 0)
    }
  }

  test("sortedNeighborPairs: distributed pairs equal the textbook global " +
    "order across partition boundaries, ties break by id, guards hold") {
    // 40 rows, keys with heavy ties so boundaries land inside tie runs
    val rows = (1L to 40L).map(i => (i, i % 7)).toSeq
    val docs = rows.toDF("doc_id", "k")
    val w = 4
    // expected: textbook sliding window over the (key, id) total order
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    val expected = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.length)
    } yield (sorted(i)._1, sorted(j)._1, sorted(i)._2, sorted(j)._2)).toSet
    for (parts <- Seq(1, 4)) {
      val got = DedupOps.sortedNeighborPairs(
        docs, "doc_id", col("k"), window = w, numParts = parts)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"numParts=$parts")
    }
    // no stage may single-partition the corpus: the plan must carry no
    // Exchange SinglePartition (the global-window formulation's tell)
    val plan = DedupOps.sortedNeighborPairs(
      docs, "doc_id", col("k"), window = w, numParts = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(800))
    intercept[IllegalArgumentException] {
      DedupOps.sortedNeighborPairs(docs, "doc_id", col("k"), window = 1)
    }
    // 40 rows over 30 partitions cannot give every partition >= 4 rows
    intercept[IllegalArgumentException] {
      DedupOps.sortedNeighborPairs(
        docs, "doc_id", col("k"), window = 4, numParts = 30)
    }
  }

  test("lineDedup: first occurrence survives in order, repeats go, docs " +
    "never empty, the plan carries no exchange") {
    val docs = Seq(
      (1L, "alpha|beta|alpha|beta|gamma"), // repeats collapse, order kept
      (2L, "solo"),                        // single segment untouched
      (3L, "x|x|x"),                       // all same -> one survivor
      (4L, ""))                            // empty text -> one empty segment
      .toDF("doc_id", "text")
    val out = DedupOps.lineDedup(docs, "doc_id", "text", "\\|", "|")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 5, 3, "alpha|beta|gamma"),
      (2L, 1, 1, "solo"),
      (3L, 3, 1, "x"),
      (4L, 1, 1, "")))
    // the whole operator must be one in-row projection: no shuffle, no
    // window, no join anywhere in the physical plan
    val plan = DedupOps.lineDedup(docs, "doc_id", "text", "\\|", "|")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    intercept[IllegalArgumentException] {
      DedupOps.lineDedup(
        docs.withColumn("n_kept", lit(1)), "doc_id", "text", "\\|", "|")
    }
  }

  test("editDistanceVerify: textbook distances, identity pairs score " +
    "1.0, maxChars caps the compared prefix, guards reject negatives") {
    val docs = Seq(
      (1L, "kitten"), (2L, "sitting"), (3L, "kitten"), (4L, ""), (5L, ""))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("a", "b")
    val got = DedupOps.editDistanceVerify(pairs, docs, "doc_id", "text")
      .select($"a", $"b", $"edit_dist", $"similarity")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got === Seq(
      (1L, 2L, 3, 0.571429), // kitten->sitting: the classic 3
      (1L, 3L, 0, 1.0),
      (1L, 4L, 6, 0.0),  // vs empty: dist = len, similarity 0
      (4L, 5L, 0, 1.0))) // empty vs empty: identical -> 1.0, not null
    val capped = DedupOps.editDistanceVerify(
      Seq((1L, 2L)).toDF("a", "b"), docs, "doc_id", "text", maxChars = 3)
      .select($"edit_dist", $"similarity")
      .as[(Int, Double)].head()
    assert(capped === ((1, 0.666667))) // kit vs sit
    intercept[IllegalArgumentException] {
      DedupOps.editDistanceVerify(pairs, docs, "doc_id", "text", -1)
    }
  }

  test("fuzzyFlagContaminated: near-identical text flags, unrelated text " +
    "passes, the benchmark doc flags against itself, guards") {
    val evalItem = "which year did the treaty of utrecht end the war"
    val corpus = Seq(
      // lightly edited copy of the benchmark item (tail append keeps
      // every original shingle; Jaccard 8/9) — shares most shingles
      (1L, "which year did the treaty of utrecht end the war exactly"),
      (2L, "completely different text about soil moisture sensors here"),
      (10L, evalItem)) // verbatim (the benchmark doc itself)
      .toDF("doc_id", "text")
    val bench = Seq((10L, evalItem)).toDF("doc_id", "text")
    val got = DedupOps.fuzzyFlagContaminated(
      corpus, bench, "doc_id", "text", tau = 0.5)
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, true), (2L, false), (10L, true)))
    intercept[IllegalArgumentException] {
      DedupOps.fuzzyFlagContaminated(
        corpus, bench, "doc_id", "text", tau = 0.0)
    }
  }

  test("bandRows capMetric: past-cap rows surface as an observed metric " +
    "(a capped candidate is a safety-gate false negative — ADVICE r12 " +
    "asks for cap events to be visible, not silent)") {
    // four IDENTICAL docs -> each of the 2 band buckets holds 4 rows;
    // maxBucket=2 silently drops 2 per bucket, 4 total
    val docs = (1L to 4L).map(i => (i, "aaa bbb ccc ddd eee"))
      .toDF("doc_id", "text")
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("cap_test").foreach(r => seen = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val kept = DedupOps.bandRows(docs, "doc_id", "text",
        shingleK = 3, numPerm = 8, bands = 2, maxBucket = 2,
        withSig = false, capMetric = Some("cap_test")).count()
      assert(kept === 4L) // 2 buckets x cap 2
      val deadline = System.currentTimeMillis + 30000
      while (seen.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50) // QueryExecutionListener delivery is async
      assert(seen.isDefined, "observed cap metric never delivered")
      assert(seen.get.getAs[Long]("rows_past_cap") === 4L)
      assert(seen.get.getAs[Int]("max_bucket_rank") === 4)
    } finally spark.listenerManager.unregister(listener)
  }

  test("substringSpans: cross-doc duplicate windows mark spans, " +
    "overlapping and abutting windows merge, gaps split, short docs " +
    "and clean docs report zeros") {
    val docs = Seq(
      // C/D/E: C's three windows all duplicated via D and E — the
      // overlapping coverage must merge into ONE span over all 6 tokens
      (1L, "a b c d e f"),
      (2L, "a b c d e z"),
      (3L, "b c d e f y"),
      // F: within-doc repetition — [1,4] and [5,8] coverage ABUTS
      // (5 > 4+1 is false), so one contiguous 8-token span
      (4L, "m n o p m n o p"),
      // G/H: the same 4-token run at positions 1 and 9, separated by
      // unique tokens — two spans, 8 of 12 tokens covered
      (5L, "d1 d2 d3 d4 g1 g2 g3 g4 d1 d2 d3 d4"),
      (6L, "u1 d1 d2 d3 d4 u2 u3 u4 u5 u6 u7 u8"),
      // short doc: fewer tokens than w — zero windows
      (7L, "t u"),
      // clean doc: windows exist but none duplicated
      (8L, "q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    val out = DedupOps.substringSpans(docs, "doc_id", "text", w = 4)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"n_windows", $"n_dup_windows",
        $"n_dup_spans", $"dup_tokens", $"dup_frac")
      .as[(Long, Int, Int, Int, Int, Long, Double)].collect()
    assert(out(0) === ((1L, 6, 3, 3, 1, 6L, 1.0)))
    assert(out(1) === ((2L, 6, 3, 2, 1, 5L, 0.833333)))
    assert(out(2) === ((3L, 6, 3, 2, 1, 5L, 0.833333)))
    assert(out(3) === ((4L, 8, 5, 2, 1, 8L, 1.0)))
    assert(out(4) === ((5L, 12, 9, 2, 2, 8L, 0.666667)))
    assert(out(5) === ((6L, 12, 9, 1, 1, 4L, 0.333333)))
    assert(out(6) === ((7L, 2, 0, 0, 0, 0L, 0.0)))
    assert(out(7) === ((8L, 6, 3, 0, 0, 0L, 0.0)))
  }

  test("substringDedup: global first occurrence survives byte-identical, " +
    "non-owner coverage is cut, owner coverage is immune to overlapping " +
    "dups, within-doc repeats keep the first copy, clean/short docs " +
    "pass through") {
    val docs = Seq(
      (1L, "a b c d e f"),   // owns every shared window -> untouched
      (2L, "a b c d e z"),   // loses [1,5] to doc1 -> "z"
      (3L, "b c d e f y"),   // loses [1,5] to doc1 -> "y"
      (4L, "m n o p m n o p"), // within-doc: keeps FIRST run
      (5L, "d1 d2 d3 d4 g1 g2 g3 g4 d1 d2 d3 d4"), // owner at 1, red at 9
      (6L, "u1 d1 d2 d3 d4 u2 u3 u4 u5 u6 u7 u8"), // loses [2,5] to doc5
      (7L, "t u"),
      (8L, "q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    val out = DedupOps.substringDedup(docs, "doc_id", "text", w = 4)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"n_removed", $"n_kept",
        $"text_dedup")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(out(0) === ((1L, 6, 0, 6, "a b c d e f")))
    assert(out(1) === ((2L, 6, 5, 1, "z")))
    assert(out(2) === ((3L, 6, 5, 1, "y")))
    assert(out(3) === ((4L, 8, 4, 4, "m n o p")))
    assert(out(4) === ((5L, 12, 4, 8, "d1 d2 d3 d4 g1 g2 g3 g4")))
    assert(out(5) === ((6L, 12, 4, 8, "u1 u2 u3 u4 u5 u6 u7 u8")))
    assert(out(6) === ((7L, 2, 0, 2, "t u")))
    assert(out(7) === ((8L, 6, 0, 6, "q1 q2 q3 q4 q5 q6")))
    // removal is idempotent: a second pass over the dedup'd corpus
    // finds nothing left to cut
    val again = DedupOps.substringDedup(
      out.map(r => (r._1, r._5)).toSeq.toDF("doc_id", "text"),
      "doc_id", "text", w = 4)
      .select($"doc_id", $"text_dedup").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(again.map(_._2).toSeq === out.map(_._5).toSeq)
  }

  test("ExactSubstr id validation (ADVICE r14): non-integral id types " +
    "reject statically; null/negative ids fail in-plan on every " +
    "ownership consumer — and the assert rides __key, not the " +
    "hash-count lineage (the d23 text-only scan pin)") {
    val bad = Seq(("x", "a b c d e"), ("y", "a b c d e"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DedupOps.substringDedup(bad, "doc_id", "text", w = 4)
    }
    val neg = Seq((-1L, "a b c d e"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      DedupOps.substringDedup(neg, "doc_id", "text", w = 4).collect()
    }
    assert(e.getMessage != null)
    val nul = Seq((java.lang.Long.valueOf(3L), "a b c d e"),
      (null.asInstanceOf[java.lang.Long], "a b c d e"))
      .toDF("doc_id", "text")
    intercept[Exception] {
      DedupOps.substrIndex(nul, "doc_id", "text", w = 4).collect()
    }
  }

  test("substrIndex: per-half summaries merge into the whole build; " +
    "spansAgainst/dedupAgainst on a batch equal the union computation " +
    "restricted to the batch (incl. cross-corpus ownership: an indexed " +
    "owner removes the batch copy); an empty index degrades to the " +
    "plain form") {
    val w = 4
    val corpusA = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e z"),
      (3L, "b c d e f y"),
      (4L, "m n o p m n o p")).toDF("doc_id", "text")
    val batchB = Seq(
      (5L, "d1 d2 d3 d4 g1 g2 g3 g4 d1 d2 d3 d4"),
      (6L, "u1 d1 d2 d3 d4 u2 u3 u4 u5 u6 u7 u8"),
      (7L, "t u"),
      (8L, "q1 q2 q3 q4 q5 q6"),
      // cross-corpus: window "a b c d" is OWNED by doc 1 in the
      // indexed corpus — the batch copy must be removed
      (9L, "a b c d x9 y9 z9")).toDF("doc_id", "text")
    val all = corpusA.union(batchB)

    def idxRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"wh", $"cnt", $"minkey").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val whole = DedupOps.substrIndex(all, "doc_id", "text", w)
    val merged = DedupOps.substrIndexMerge(
      DedupOps.substrIndex(corpusA, "doc_id", "text", w)
        .union(DedupOps.substrIndex(batchB, "doc_id", "text", w)))
    assert(idxRows(merged) === idxRows(whole))

    val idx = DedupOps.substrIndex(corpusA, "doc_id", "text", w)
    def spansRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_tokens", $"n_windows", $"n_dup_windows",
        $"n_dup_spans", $"dup_tokens", $"dup_frac")
        .as[(Long, Int, Int, Int, Int, Long, Double)]
        .collect().sortBy(_._1).toSeq
    assert(
      spansRows(DedupOps.substringSpansAgainst(
        idx, batchB, "doc_id", "text", w)) ===
      spansRows(DedupOps.substringSpans(all, "doc_id", "text", w)
        .filter($"doc_id" >= 5L)))
    def dedupRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_tokens", $"n_removed", $"n_kept",
        $"text_dedup")
        .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    val against = dedupRows(DedupOps.substringDedupAgainst(
      idx, batchB, "doc_id", "text", w))
    assert(against ===
      dedupRows(DedupOps.substringDedup(all, "doc_id", "text", w)
        .filter($"doc_id" >= 5L)))
    // the cross-corpus case concretely: doc 9 lost "a b c d" to doc 1
    assert(against.find(_._1 == 9L).get._5 === "x9 y9 z9")
    // an empty index degrades both AGAINST forms to the plain ones
    val empty = DedupOps.substrIndex(
      corpusA.limit(0), "doc_id", "text", w)
    assert(
      spansRows(DedupOps.substringSpansAgainst(
        empty, batchB, "doc_id", "text", w)) ===
      spansRows(DedupOps.substringSpans(batchB, "doc_id", "text", w)))
    assert(
      dedupRows(DedupOps.substringDedupAgainst(
        empty, batchB, "doc_id", "text", w)) ===
      dedupRows(DedupOps.substringDedup(batchB, "doc_id", "text", w)))
  }
}
