package graft

import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.functions._

/** Recall@10 of every approximate-search path against v1's exact answer.
  *
  * Hash-parity oracles prove each ANN operator computes ITS OWN
  * definition correctly, but cannot catch a silent quality regression —
  * a bucketing change that halves recall still hash-matches its own
  * oracle. This spec measures what an ANN user cares about: how much of
  * the exact top-k the approximate path returns, averaged over a fixed
  * query set spread across the corpus. Every operator here is seed-free
  * by construction, so these are exact repeatable numbers, not a
  * statistical bound.
  *
  * Fixture reality check (full table in SCALE.md §4): the synthetic
  * embeddings are near-uniform random 64-dim vectors, so pairwise
  * distances CONCENTRATE — the gap between a query's 10th and 50th
  * neighbor is tiny, and hash-style partitioners (sign-LSH buckets, PQ
  * codes) carry almost no proximity signal (recall 0.0–0.3 at the
  * oracle parameters). The learned k-means cells are the one
  * structure-bearing partitioner: recall 0.76 at nprobe=2/4, 0.90 at
  * 3/4, exact at 4/4. Real embedding corpora live on low-dimensional
  * manifolds where all these curves sit far higher — so the assertions
  * below pin (a) the STRUCTURAL guarantees that hold on any corpus
  * (multi-probe candidates are a superset of single-bucket; IVF recall
  * is monotone in nprobe and exact at full probe; ADC re-ranking
  * recovers candidates plain ADC order loses) and (b) floors at the
  * measured values minus headroom, so a candidate-generation break
  * (wrong bucket join, dropped cell, scrambled codes) fails loudly.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val k = 10
  // spread across the 500-row corpus; id 0 keeps parity with the oracles
  private val queryIds = Seq(0L, 97L, 211L, 350L, 499L)

  private lazy val emb = Tables(spark, dir, "embeddings").cache()

  // the test session is shared across every suite in the JVM — release
  // the cache (the r3 bench post-mortem's persist-leak discipline)
  override def afterAll(): Unit = {
    emb.unpersist()
    super.afterAll()
  }

  private lazy val exactTop: Map[Long, Set[Long]] = queryIds.map { qid =>
    qid -> SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === qid), "vec_id", "embedding", k)
      .select($"vec_id").as[Long].collect().toSet
  }.toMap

  /** Mean |approx ∩ exact| / k over the query set. */
  private def recallOf(name: String)(approx: Long => Set[Long]): Double = {
    val r = queryIds.map { qid =>
      val got = approx(qid)
      assert(got.size <= k, s"$name returned ${got.size} > k rows for $qid")
      exactTop(qid).intersect(got).size.toDouble / k
    }.sum / queryIds.size
    info(f"recall@$k($name) = $r%.2f")
    r
  }

  private def v2Recall(planes: Int): Double =
    recallOf(s"v2_lsh planes=$planes") { qid =>
      SimilarityOps.lshTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        numPlanes = planes, k = k)
        .filter($"is_candidate" && $"rank" <= k)
        .select($"vec_id").as[Long].collect().toSet
    }

  private def v8Recall(planes: Int): Double =
    recallOf(s"v8_multiprobe planes=$planes") { qid =>
      SimilarityOps.lshMultiProbeTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        numPlanes = planes, k = k)
        .select($"vec_id").as[Long].collect().toSet
    }

  private def v7Recall(nprobe: Int): Double =
    recallOf(s"v7_ivf_learned k=4 nprobe=$nprobe") { qid =>
      SimilarityOps.ivfTopKLearned(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        kCells = 4, trainIters = 2, nprobe = nprobe, k = k)
        .select($"vec_id").as[Long].collect().toSet
    }

  test("learned IVF (v7): recall is monotone in nprobe, >=0.8 at 3/4 " +
    "probed cells, and EXACT at full probe") {
    val r2 = v7Recall(2) // measured 0.76
    val r3 = v7Recall(3) // measured 0.90
    val r4 = v7Recall(4) // full probe == brute force by construction
    assert(r2 <= r3 && r3 <= r4, s"recall must not drop as nprobe grows: " +
      s"$r2, $r3, $r4")
    assert(r2 >= 0.6, s"v7 nprobe=2 recall $r2 under floor 0.6")
    assert(r3 >= 0.8, s"v7 nprobe=3 recall $r3 under floor 0.8")
    assert(r4 === 1.0, s"probing every cell must reproduce the exact " +
      s"top-$k, got $r4")
  }

  test("IVF recall is ASSIGNMENT-PATH independent: flat argmin and the " +
    "coarse-quantizer tree yield identical cells, hence identical " +
    "recall at every nprobe (v30's quality under VERDICT r16 item 1)") {
    // same learned codebook, both assignment expressions forced; the
    // serving tail is shared, so any recall drift must come from a cell
    // that moved — which the NearestKitSpec bit-parity pin makes
    // impossible; this measures the user-facing consequence directly
    val (_, cent) = SimilarityOps.kmeansFit(
      emb, "vec_id", "embedding", k = 4, iters = 2)
    val cents = SimilarityOps.centroidArrays(cent)
    def recallVia(tag: String, cellOf: org.apache.spark.sql.Column,
        nprobe: Int): Double = {
      val cells = emb.select($"vec_id", $"embedding",
        cellOf.getField("cluster").as("cell"))
      recallOf(s"ivf_$tag nprobe=$nprobe") { qid =>
        val qv = emb.filter($"vec_id" === qid)
          .select($"embedding".cast("array<double>"))
          .as[Array[Double]].head()
        // probe cells by cosine against the codebook (driver-side,
        // shared between the two paths)
        def dot(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        val probed = cents
          .map { case (c, arr) =>
            (c, dot(qv, arr) / (math.sqrt(dot(qv, qv)) *
              math.sqrt(dot(arr, arr))))
          }
          .sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1)
        cells.filter($"cell".isin(probed: _*) && $"vec_id" =!= qid)
          .select($"vec_id",
            SimilarityOps.cosine($"embedding", typedlit(qv)).as("sim"))
          .orderBy($"sim".desc, $"vec_id".asc).limit(k)
          .select($"vec_id").as[Long].collect().toSet
      }
    }
    for (nprobe <- Seq(2, 3, 4)) {
      val rFlat = recallVia("flat",
        SimilarityOps.nearestExprFlat($"embedding", cents), nprobe)
      val rTree = recallVia("tree",
        SimilarityOps.nearestExprTree($"embedding", cents), nprobe)
      assert(rFlat === rTree,
        s"assignment path changed recall at nprobe=$nprobe: " +
          s"flat=$rFlat tree=$rTree")
    }
  }

  test("label IVF (v5): semantic cells carry some signal; recall grows " +
    "with nprobe") {
    val r2 = recallOf("v5_ivf_ann nprobe=2") { qid =>
      SimilarityOps.ivfTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        "label", nprobe = 2, k = k)
        .select($"vec_id").as[Long].collect().toSet
    } // measured 0.38 — the fixture's labels are weak proximity proxies
    val r4 = recallOf("v5_ivf_ann nprobe=4") { qid =>
      SimilarityOps.ivfTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        "label", nprobe = 4, k = k)
        .select($"vec_id").as[Long].collect().toSet
    } // measured 0.60
    assert(r2 >= 0.25, s"v5 nprobe=2 recall $r2 under floor 0.25")
    assert(r4 >= r2, s"recall must not drop as nprobe grows: $r2 -> $r4")
  }

  test("multi-probe LSH (v8) dominates single-bucket (v2) at every plane " +
    "count — the superset guarantee — and both degrade as planes grow") {
    // 2 planes = 4 buckets over 500 vectors (multi-probe scans 3 of 4);
    // 8 planes = 256 buckets, the oracle parameterization, where a
    // bucket holds ~2 vectors and recall collapses — measured 0.62/0.48
    // and 0.08/0.00. The spread is the fixture's missing manifold
    // structure, not an implementation property; the invariant that IS
    // implementation-owned: multi-probe candidates ⊇ single-bucket
    // candidates, so its recall can never be lower.
    val pairs = Seq(2, 8).map { p => (p, v8Recall(p), v2Recall(p)) }
    pairs.foreach { case (p, multi, single) =>
      assert(multi >= single,
        s"planes=$p: multi-probe $multi below single-bucket $single")
    }
    val (_, m2, s2) = pairs.head
    assert(m2 >= 0.5, s"v8 planes=2 recall $m2 under floor 0.5")
    assert(s2 >= 0.3, s"v2 planes=2 recall $s2 under floor 0.3")
  }

  private def v28Recall(rerank: Int): Double =
    recallOf(s"v28_binary_quant rerank=$rerank") { qid =>
      SimilarityOps.binaryQuantTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        dims = 64, k = k, rerankFactor = rerank)
        .select($"vec_id").as[Long].collect().toSet
    }

  test("binary quantization (v28): recall is monotone in the re-rank " +
    "budget and EXACT when the Hamming cut covers the corpus") {
    // Hamming candidates at budget b are a prefix of the candidates at
    // budget b' > b (same total order), so recall can never decrease —
    // the implementation-owned superset invariant. At k·rerank >= n-1
    // the 'cut' is the whole corpus and the exact re-rank IS v1.
    // Measured on this fixture: 0.58 at rerank=4, 0.94 at rerank=16
    // (sign bits keep real angular signal here, unlike the PQ codes —
    // one bit per dim beats 4 sub-vector codes at 64 dims).
    val r4 = v28Recall(4)
    val r16 = v28Recall(16)
    val rAll = v28Recall(50) // k*50 = 500 >= n-1: exhaustive
    assert(r4 <= r16 && r16 <= rAll,
      s"recall not monotone in re-rank budget: $r4, $r16, $rAll")
    assert(rAll === 1.0, s"full-cover re-rank not exact: $rAll")
    assert(r4 >= 0.4, s"v28 rerank=4 recall $r4 under floor 0.4")
  }

  test("PQ/ADC (v10): quantization alone cannot rank this corpus; the " +
    "served IVFxPQ path recovers IVF-level recall via exact re-rank") {
    // Plain trained ADC at the oracle's 4x4 geometry: measured 0.10 —
    // distance concentration leaves sub-vector codebooks no signal.
    val adc = recallOf("v10_pq_adc 4x4 iters=2") { qid =>
      SimilarityOps.pqTopK(
        emb, emb.filter($"vec_id" === qid), "vec_id", "embedding",
        numSub = 4, kCodes = 4, iters = 2, k = k)
        .select($"vec_id").as[Long].collect().toSet
    }
    assert(adc >= 0.0 && adc <= 1.0)

    val d = tempDirFile("graft_recall_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/index"
    IvfIndex.write(
      emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path = path,
      pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2)))
    def served(nprobe: Int, refine: Int): Long => Set[Long] = { qid =>
      val qvec = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>"))
        .as[Array[Double]].head()
      IvfIndex.queryAdc(
        spark, path, qvec, excludeId = Some(qid),
      nprobe = nprobe, k = k, refine = refine)
        .select($"vec_id").as[Long].collect().toSet
    }
    // small refine: ADC ordering decides who reaches the re-rank, and on
    // this corpus it loses most true neighbors (measured 0.30)
    val narrow = recallOf("ivfpq nprobe=2 refine=50")(served(2, 50))
    // refine >= probed population: the exact re-rank sees every
    // candidate, so recall equals learned-IVF recall at the same nprobe
    // — the refine knob is the contract that makes PQ shippable even
    // when quantization is weak
    val wide = recallOf("ivfpq nprobe=3 refine=500")(served(3, 500))
    val ivfR3 = v7Recall(3)
    assert(wide >= narrow,
      s"widening refine must not lose recall: $narrow -> $wide")
    assert(wide === ivfR3,
      s"full-refine IVFxPQ recall $wide must equal learned-IVF $ivfR3")
    assert(wide >= 0.8, s"served IVFxPQ recall $wide under floor 0.8")
  }

  test("residual PQ (true IVFADC) ranks better than raw PQ at equal " +
    "nprobe/refine, and still recovers IVF recall at full refine") {
    // Same coarse codebook, same 4x4 PQ geometry (the oracle's), only
    // the quantized quantity differs: raw vectors vs cell residuals.
    // Residuals carry less energy (the coarse term is already explained
    // by the cell), so the same code budget quantizes a tighter
    // distribution — measured on this fixture: refine=50 recall
    // 0.30->0.42 (nprobe=2) and 0.20->0.44 (nprobe=3), refine=30
    // 0.18->0.28. Every operator here is seed-free, so these are exact
    // repeatable numbers; floors sit under the measurement with
    // headroom, and the raw-vs-residual dominance is asserted pairwise
    // at each budget.
    def build(residual: Boolean): String = {
      val d = tempDirFile(s"graft_recall_res${residual}_")
      d.deleteOnExit()
      val path = d.getAbsolutePath + "/index"
      IvfIndex.write(
        emb, "vec_id", "embedding", kCells = 4, trainIters = 2, path = path,
        pq = Some(IvfIndex.Pq(numSub = 4, kCodes = 4, iters = 2,
          residual = residual)))
      path
    }
    val rawPath = build(residual = false)
    val resPath = build(residual = true)
    def served(path: String, nprobe: Int, refine: Int): Double =
      recallOf(s"${path.split('_').init.last} nprobe=$nprobe refine=$refine") {
        qid =>
          val qvec = emb.filter($"vec_id" === qid)
            .select($"embedding".cast("array<double>"))
            .as[Array[Double]].head()
          IvfIndex.queryAdc(spark, path, qvec, excludeId = Some(qid),
            nprobe = nprobe, k = k, refine = refine)
            .select($"vec_id").as[Long].collect().toSet
      }
    Seq((2, 50), (3, 30), (3, 50)).foreach { case (nprobe, refine) =>
      val raw = served(rawPath, nprobe, refine)
      val res = served(resPath, nprobe, refine)
      assert(res >= raw, s"residual ADC recall $res below raw $raw at " +
        s"nprobe=$nprobe refine=$refine — residual encoding must not rank " +
        "worse at equal budget")
    }
    assert(served(resPath, 3, 50) >= 0.35,
      "residual ADC recall at nprobe=3 refine=50 under floor 0.35 " +
        "(measured 0.44)")
    // the refine contract is independent of what was quantized: at
    // full refine the exact re-rank sees every probed candidate
    val full = served(resPath, 3, 500)
    assert(full === v7Recall(3),
      s"full-refine residual IVFxPQ recall $full must equal learned-IVF")
  }
}
