package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpec {

  test("kmeansClusters separates two well-separated blobs (k=2)") {
    import spark.implicits._
    // blob A near the origin (ids 0,1,2), blob B near (10,10) (ids 3,4,5);
    // init = two lowest ids, both in blob A — the update step must still
    // pull one centroid across to blob B within two iterations
    val vecs = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.2f, 0.1f)),
      (3L, Array(10.0f, 10.1f)), (4L, Array(10.1f, 9.9f)), (5L, Array(9.9f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.SimilarityOps
      .kmeansClusters(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(Set(out(0L), out(1L), out(2L)).size === 1, "blob A one cluster")
    assert(Set(out(3L), out(4L), out(5L)).size === 1, "blob B one cluster")
    assert(out(0L) !== out(3L), "blobs in different clusters")
  }
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 0),
    (3L, Array(0.0f, 0.0f, 1.0f), 1),
    (4L, Array(0.0f, 0.1f, 0.9f), 1))
    .toDF("vec_id", "embedding", "label")

  test("cosine: orthogonal -> 0, identical -> 1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.5f, 0.5f), Array(0.5f, 0.5f)))
      .toDF("a", "b")
    val out = df.select(SimilarityOps.cosine($"a", $"b")).as[Double].collect()
    assert(out(0) === 0.0)
    assert(out(1) === 1.0)
  }

  test("bruteForceTopK ranks by cosine, excludes the query itself") {
    val q = emb.filter($"vec_id" === 0)
    val out = SimilarityOps.bruteForceTopK(emb, q, "vec_id", "embedding", 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(out(1L) === 1) // closest: nearly parallel
    assert(out.size === 2)
    assert(!out.contains(0L))
  }

  test("signBits packs sign bits into words; hammingWords counts flips") {
    // 3 dims in word 0; a 70-dim vector spills into a second word
    val df = Seq(
      (0L, Array(1.0f, -2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, -3.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))) // zeros are NOT positive -> no bits
      .toDF("vec_id", "embedding")
    val codes = df.select($"vec_id",
      SimilarityOps.signBits($"embedding", 3).as("c"))
      .as[(Long, Array[Long])].collect().toMap
    assert(codes(0L).toSeq === Seq(0x5L)) // bits 0 and 2
    assert(codes(1L).toSeq === Seq(0x3L)) // bits 0 and 1
    assert(codes(2L).toSeq === Seq(0x0L))
    val wide = Seq((0L, Array.fill(70)(1.0f))).toDF("vec_id", "embedding")
      .select(SimilarityOps.signBits($"embedding", 70).as("c"))
      .as[Array[Long]].head()
    assert(wide.length === 2)
    assert(wide(0) === -1L) // all 64 bits set
    assert(wide(1) === (1L << 6) - 1) // dims 64..69 -> low 6 bits
    val h = df.as("a").crossJoin(df.as("b"))
      .select($"a.vec_id", $"b.vec_id",
        SimilarityOps.hammingWords(
          SimilarityOps.signBits($"a.embedding", 3),
          SimilarityOps.signBits($"b.embedding", 3)).as("h"))
      .as[(Long, Long, Int)].collect()
      .map { case (x, y, d) => (x, y) -> d }.toMap
    assert(h((0L, 0L)) === 0)
    assert(h((0L, 1L)) === 2) // bits 1 and 2 differ
    assert(h((0L, 2L)) === 2)
  }

  test("binaryQuantTopK: exact re-rank orders candidates by cosine and " +
    "the Hamming first pass excludes bit-distant vectors") {
    // query 0 along +x; id 1 nearly parallel (same signs), id 2 orthogonal
    // (different sign pattern), id 3 antipodal (every bit flipped)
    val df = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (1L, Array(0.9f, 1.1f, 0.8f, 1.2f)),
      (2L, Array(-1.0f, 1.0f, -1.0f, 1.0f)),
      (3L, Array(-1.0f, -1.0f, -1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.binaryQuantTopK(
      df, df.filter($"vec_id" === 0), "vec_id", "embedding",
      dims = 4, k = 2, rerankFactor = 1)
      .select("vec_id", "hamming", "rank").as[(Long, Int, Int)].collect()
    assert(out.map(_._1).toSet === Set(1L, 2L), "k*rerank=2 keeps the two " +
      "lowest-Hamming ids; the antipodal vector (hamming 4) is cut")
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === 0 && byId(1L)._3 === 1) // same signs, top cosine
    assert(byId(2L)._2 === 2)
  }

  test("lshBucket is deterministic and groups identical vectors") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val out = df.select($"vec_id",
      SimilarityOps.lshBucket($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(out(0L) === out(1L))
    assert(out(0L) !== out(2L)) // opposite vector flips every sign bit
    assert(out.values.forall(b => b >= 0 && b < 256))
  }

  test("native lshBucket === higher-order twin (incl. empty and double)") {
    // deterministic pseudo-random float vectors + edge shapes
    val vecs: Seq[Array[Float]] =
      (0 until 50).map { s =>
        Array.tabulate(64)(i => (((s * 131 + i * 17) % 97) - 48) / 7.0f)
      } :+ Array.empty[Float] :+ Array(0.0f, 0.0f) :+
        Array(Float.NaN, 1.0f) :+ Array(Float.PositiveInfinity, 2.0f)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    for (planes <- Seq(1, 8, 16)) {
      val mismatch = df.select(
        SimilarityOps.lshBucket($"embedding", planes).as("native"),
        SimilarityOps.lshBucketHof($"embedding", planes).as("hof"))
        .filter($"native" =!= $"hof").count()
      assert(mismatch === 0, s"planes=$planes")
    }
    // double arrays take the other element-access path
    val dd = Seq((0L, Array(0.5, -1.5, 2.5)), (1L, Array(-0.5, 0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = dd.select(
      SimilarityOps.lshBucket($"embedding", 8).as("native"),
      SimilarityOps.lshBucketHof($"embedding", 8).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(got === 0)
  }

  test("graft_lshbucket / graft_min_shingle_md5 / graft_ngram_profile_counts are SQL-reachable") {
    emb.createOrReplaceTempView("__lsh_sql_probe")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_lshbucket(embedding, 8) AS b FROM __lsh_sql_probe")
      .as[(Long, Long)].collect().toMap
    val viaApi = emb.select($"vec_id",
      SimilarityOps.lshBucket($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql === viaApi)
    val fp = spark.sql(
      "SELECT graft_min_shingle_md5(array('the quick brown', 'quick brown fox', " +
        "'brown fox jumps'), 2) AS fp")
      .as[String].collect().head
    assert(fp != null && fp.nonEmpty)
    val counts = spark.sql(
      """SELECT graft_ngram_profile_counts(' the and ', 3,
        |  array(array(' th', 'the', 'he '), array(' de', 'der'))) AS c
        |""".stripMargin).as[Seq[Long]].collect().head
    // [0] = total gram count, [i+1] = profile i hits
    assert(counts.length === 3 && counts(0) === 7 && counts(1) > 0 &&
      counts(2) === 0)
  }

  test("lshMultiProbeTopK recovers a hamming-1 neighbor single-bucket " +
    "probing misses") {
    // find two near-identical vectors whose buckets differ in exactly one
    // bit by nudging one dimension until the bucket flips once
    val base = Array.tabulate(8)(i => (i + 1) / 10.0f)
    def bucketOf(v: Array[Float]): Long = {
      val df = Seq((0L, v)).toDF("vec_id", "embedding")
      df.select(SimilarityOps.lshBucket($"embedding", 8)).as[Long].head()
    }
    val b0 = bucketOf(base)
    val nudged = (1 to 400).iterator
      .map { s => val c = base.clone(); c(s % 8) += s * 0.01f; c }
      .find { c =>
        java.lang.Long.bitCount(bucketOf(c) ^ b0) == 1
      }.get
    val emb = Seq((0L, base), (1L, nudged), (2L, base.map(-_)))
      .toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0)
    val single = SimilarityOps.lshTopK(emb, q, "vec_id", "embedding", 8, 5)
      .filter($"is_candidate").select("vec_id").as[Long].collect().toSet
    val multi = SimilarityOps
      .lshMultiProbeTopK(emb, q, "vec_id", "embedding", 8, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(!single.contains(1L), "hamming-1 neighbor invisible to one bucket")
    assert(multi.contains(1L), "multi-probe recovers it")
    assert(!multi.contains(0L), "query itself excluded")
  }

  test("single-query guard throws in-plan for multi-row query frames") {
    val e = intercept[Exception] {
      SimilarityOps.bruteForceTopK(
        emb, emb.filter($"vec_id" < 2), "vec_id", "embedding", 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("SINGLE query row")), e.toString)
    // a one-row frame passes through the same guard untouched
    assert(SimilarityOps.bruteForceTopK(
      emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .count() === 2)
  }

  test("topKPerQuery ranks independently per query row") {
    val out = SimilarityOps.topKPerQuery(
      emb, emb.filter($"vec_id" < 2), "vec_id", "embedding", k = 2)
      .select($"qid", $"vec_id", $"rank")
      .as[(Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2)).toMap
    assert(byQ.keySet === Set(0L, 1L))
    assert(byQ(0L).head === 1L) // 1 is 0's nearest
    assert(byQ(1L).head === 0L) // and vice versa
    assert(out.forall(r => r._1 != r._2), "query never ranks itself")
    assert(out.count(_._1 == 0L) === 2 && out.count(_._1 == 1L) === 2)
  }

  test("distanceToCentroid: symmetric pair -> equal distances") {
    val df = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(2.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps
      .distanceToCentroid(df, "vec_id", "embedding", "label")
      .select("vec_id", "dist").as[(Long, Double)].collect().toMap
    // centroid (1,1); both at distance sqrt(2)
    assert(out(0L) === out(1L))
    assert(math.abs(out(0L) - math.sqrt(2)) < 1e-6)
  }

  test("nearestInGroup stays within the group") {
    val out = SimilarityOps
      .nearestInGroup(emb, "vec_id", "embedding", "label")
      .select("a", "nn").as[(Long, Long)].collect().toMap
    assert(out(0L) === 1L)
    assert(out(1L) === 0L)
    assert(out(3L) === 4L) // label 1 bucket: only 3<->4
    assert(out(4L) === 3L)
  }

  // ---- product quantization: the TRAINED path ----
  // dim 4, numSub 2 (dsubLen 2), kCodes 2; two tight groups per subspace
  // so one Lloyd's update visibly moves the codewords. All coordinates
  // are exactly representable floats.
  private def pqEmb = Seq(
    (0L, Array(0.0f, 0.0f, 10.0f, 10.0f)),
    (1L, Array(1.0f, 1.0f, 11.0f, 11.0f)),
    (2L, Array(0.5f, 0.5f, 10.5f, 10.5f)),
    (3L, Array(8.0f, 8.0f, 0.0f, 0.0f)),
    (4L, Array(9.0f, 9.0f, 1.0f, 1.0f)),
    (5L, Array(8.5f, 8.5f, 0.5f, 0.5f)))
    .toDF("vec_id", "embedding")

  /** Driver-side distortion: Σ over rows and subspaces of the min squared
    * euclidean distance from the subvector to its subspace codebook.
    */
  private def pqDistortion(
      codebook: Seq[(Int, Int, Int, Double)],
      vecs: Seq[Array[Float]],
      numSub: Int): Double = {
    val dsubLen = codebook.map(_._3).max + 1
    val byCode = codebook.groupBy(c => (c._1, c._2))
      .view.mapValues(_.sortBy(_._3).map(_._4).toArray).toMap
    vecs.map { v =>
      (0 until numSub).map { sub =>
        byCode.keys.filter(_._1 == sub).map { k =>
          val cw = byCode(k)
          (0 until dsubLen).map { d =>
            val diff = v(sub * dsubLen + d).toDouble - cw(d)
            diff * diff
          }.sum
        }.min
      }.sum
    }.sum
  }

  test("pqFit: training strictly reduces distortion vs the seed codebook") {
    val vecs = pqEmb.orderBy($"vec_id")
      .select($"embedding").as[Array[Float]].collect().toSeq
    val seed = SimilarityOps.pqFit(pqEmb, "vec_id", "embedding",
      numSub = 2, kCodes = 2, iters = 1)
    val trained = SimilarityOps.pqFit(pqEmb, "vec_id", "embedding",
      numSub = 2, kCodes = 2, iters = 3)
    val d1 = pqDistortion(seed, vecs, numSub = 2)
    val d3 = pqDistortion(trained, vecs, numSub = 2)
    assert(d3 < d1, s"trained distortion $d3 should beat seed $d1")
    // seed codebook = the two lowest-id vectors' subvectors, verbatim
    assert(seed.toSet === Set(
      (0, 0, 0, 0.0), (0, 0, 1, 0.0), (1, 0, 0, 10.0), (1, 0, 1, 10.0),
      (0, 1, 0, 1.0), (0, 1, 1, 1.0), (1, 1, 0, 11.0), (1, 1, 1, 11.0)))
  }

  test("pqEncode is deterministic under repartition") {
    val cb = SimilarityOps.pqFit(pqEmb, "vec_id", "embedding",
      numSub = 2, kCodes = 2, iters = 3)
    def enc(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      SimilarityOps.pqEncode(df, "vec_id", "embedding", cb)
        .as[(Long, Seq[Int])].collect().toMap
    val a = enc(pqEmb)
    val b = enc(pqEmb.repartition(7))
    assert(a === b)
    assert(a.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(a.values.forall(_.length === 2))
  }

  test("pqTopK (iters=1) matches a hand-computed ADC ranking") {
    // seed codebooks: sub0 {c0=(0,0), c1=(1,1)}, sub1 {c0=(10,10),
    // c1=(11,11)}; query id 0 -> table d2q: (sub0,c0)=0, (sub0,c1)=2,
    // (sub1,c0)=0, (sub1,c1)=2. Encodes: id1=[1,1], id2=[0,0] (ties ->
    // lowest code), id3/4/5=[1,0]. ADC: id2=0, id3=id4=id5=2, id1=4.
    val out = SimilarityOps.pqTopK(
      pqEmb, pqEmb.filter($"vec_id" === 0), "vec_id", "embedding",
      numSub = 2, kCodes = 2, iters = 1, k = 5)
      .select($"vec_id", $"ad2", $"rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(out === Seq(
      (2L, 0.0, 1), (3L, 2.0, 2), (4L, 2.0, 3), (5L, 2.0, 4), (1L, 4.0, 5)))
  }

  test("pqFit drops a codeword that loses all members (empty-cluster)") {
    // ids 0 and 1 are identical, so seed codes 0 and 1 coincide; every
    // row ties to the lowest code, code 1 gets no members, and the
    // Lloyd's update drops it — the standard empty-cluster behavior.
    val dup = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Array(2.0f, 2.0f, 2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val trained = SimilarityOps.pqFit(dup, "vec_id", "embedding",
      numSub = 2, kCodes = 2, iters = 2)
    assert(trained.map(_._2).distinct === Seq(0), "only code 0 survives")
    // the surviving codeword is the mean of all members in each subspace
    assert(trained.toSet === Set(
      (0, 0, 0, 0.75), (0, 0, 1, 0.75), (1, 0, 0, 0.75), (1, 0, 1, 0.75)))
    // encoding against the shrunk codebook still covers every row
    val codes = SimilarityOps.pqEncode(dup, "vec_id", "embedding", trained)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.keySet === Set(0L, 1L, 2L, 3L))
    assert(codes.values.forall(_ === Seq(0, 0)))
  }

  test("l2NormalizeCol: unit norm out, zero vector stays zeros; " +
    "dimStats: hand-computed per-dim stats") {
    val vs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("id", "v")
    val unit = SimilarityOps.l2Normalize(vs, "v", "unit")
      .select($"id", $"unit")
      .as[(Long, Seq[Double])].collect().toMap
    assert(unit(1L) === Seq(0.6, 0.8))
    assert(unit(2L) === Seq(0.0, 0.0)) // zero vector: zeros, not NaN
    assert(unit(3L) === Seq(1.0, 0.0))

    val stats = SimilarityOps.dimStats(
      Seq((1L, Array(1.0f, 10.0f)), (2L, Array(3.0f, 30.0f)))
        .toDF("id", "v"), "v")
      .as[(Int, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // dim0: {1,3} mean 2 std sqrt(2); dim1: {10,30} mean 20 std sqrt(200)
    assert(stats === Seq(
      (0, 2L, 1.0, 3.0, 2.0, 1.414214),
      (1, 2L, 10.0, 30.0, 20.0, 14.142136)))

    // single observation: sample std is undefined — null, never the
    // 0/0 NaN (which would poison hash-compares and range sizing)
    val one = SimilarityOps.dimStats(
      Seq((1L, Array(5.0f))).toDF("id", "v"), "v")
      .select($"n", $"std")
      .as[(Long, Option[Double])].collect().toSeq
    assert(one === Seq((1L, None)))
  }

  test("mmrRerank: lambda=1 is plain sim order; diversity demotes the " +
    "near-duplicate of the top pick below a diverse candidate; " +
    "per-query isolation; guards") {
    import spark.implicits._
    // A (top), B (near-duplicate of A), C (orthogonal, lower sim)
    val cands = Seq(
      (0L, 10L, Array(1.0f, 0.0f), 0.90),
      (0L, 11L, Array(1.0f, 0.01f), 0.85),
      (0L, 12L, Array(0.0f, 1.0f), 0.50),
      // a second query must re-rank independently
      (1L, 20L, Array(1.0f, 0.0f), 0.30),
      (1L, 21L, Array(0.0f, 1.0f), 0.80))
      .toDF("qid", "vec_id", "embedding", "sim")
    val plain = SimilarityOps.mmrRerank(cands, lambdaParam = 1.0, k = 3)
      .as[(Long, Int, Long, Double)].collect()
      .filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    assert(plain === Seq(10L, 11L, 12L)) // pure sim order
    val div = SimilarityOps.mmrRerank(cands, lambdaParam = 0.6, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    val q0 = div.filter(_._1 == 0L).sortBy(_._2)
    // B's redundancy vs A (~cos 1.0) scores 0.6*0.85-0.4*~1 ≈ 0.11,
    // C scores 0.6*0.5-0 = 0.30 → C overtakes the near-duplicate
    assert(q0.map(_._3).toSeq === Seq(10L, 12L, 11L))
    assert(q0.head._4 === 0.54) // λ·0.9 exactly, rounded 6
    val q1 = div.filter(_._1 == 1L).sortBy(_._2)
    assert(q1.map(_._3).toSeq === Seq(21L, 20L)) // isolated per query
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrRerank(cands, lambdaParam = 1.5, k = 3)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrRerank(cands, lambdaParam = 0.5, k = 0)
    }
  }

  test("powerIteration: recovers a planted dominant axis, loadings are " +
    "unit-norm within rounding, the all-ones start fixes the sign, " +
    "reruns are bit-identical, iters guard") {
    // 30 vectors ~ along axis 0 (amplitude 3) with small noise on
    // axis 1 and nothing on 2/3: dominant eigenvector ≈ e0, and the
    // positive amplitudes + all-ones start force loading(0) > 0
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array(3.0f, 0.1f * (i % 3 - 1), 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def run() = SimilarityOps.powerIteration(
      vecs, "vec_id", "embedding", iters = 2)
      .orderBy($"dim")
      .select($"dim", $"loading", $"eigval")
      .as[(Int, Double, Double)].collect().toSeq
    val out = run()
    assert(out.map(_._1) === Seq(0, 1, 2, 3))
    val loadings = out.map(_._2)
    assert(loadings(0) > 0.99, loadings.toString) // planted axis, + sign
    assert(math.abs(loadings(1)) < 0.1)
    assert(loadings(2) === 0.0)
    assert(loadings(3) === 0.0)
    val norm = loadings.map(x => x * x).sum
    assert(math.abs(norm - 1.0) < 1e-8, norm.toString)
    // eigval ≈ Σ x0² = 30 · 9 = 270 (noise adds ~0.2)
    assert(math.abs(out.head._3 - 270.0) < 2.0, out.head._3.toString)
    assert(run() === out) // deterministic trajectory
    intercept[IllegalArgumentException] {
      SimilarityOps.powerIteration(vecs, "vec_id", "embedding", iters = 0)
    }
  }

  test("pcaProject: on-axis vectors project to ~their amplitude with ~0 " +
    "residual, orthogonal vectors project to ~0 with full residual, " +
    "Pythagoras holds per row") {
    // axis-0-dominant corpus (forces loading ≈ e0), plus one probe on
    // axis 1 — pure off-axis energy
    val vecs = ((0 until 20).map(i =>
      (i.toLong, Array(2.0f + 0.01f * (i % 2), 0.0f, 0.0f, 0.0f))) :+
      (99L, Array(0.0f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val load = SimilarityOps.powerIteration(
      vecs, "vec_id", "embedding", iters = 2)
    val out = SimilarityOps.pcaProject(vecs, "vec_id", "embedding", load)
      .as[(Long, Double, Double)].collect()
      .map { case (id, p, r) => id -> ((p, r)) }.toMap
    val onAxis = out(0L)
    assert(math.abs(onAxis._1 - 2.0) < 0.01, onAxis.toString)
    assert(onAxis._2 < 0.05, onAxis.toString)
    val ortho = out(99L)
    assert(math.abs(ortho._1) < 0.05, ortho.toString)
    assert(math.abs(ortho._2 - 0.5) < 0.05, ortho.toString)
    // Pythagoras: proj² + resid² == ‖x‖² within rounding, every row
    out.foreach { case (id, (p, r)) =>
      val n2 = if (id == 99L) 0.25
        else { val a = 2.0 + 0.01 * (id % 2); a * a }
      assert(math.abs(p * p + r * r - n2) < 1e-3, s"$id: $p $r")
    }
    // plan shape: loadings broadcast, one exchange keyed on the id
    val plan = SimilarityOps.pcaProject(vecs, "vec_id", "embedding", load)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
