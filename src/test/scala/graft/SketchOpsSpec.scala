package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** KMV sketches: lossless merge (sketch of a union == merged per-part
  * sketches — the distributed-rollup algebra), exactness below k,
  * estimator accuracy on a real column, and guards.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("merging per-part sketches equals the sketch of the whole — the " +
    "rollup algebra — and estimates match either way") {
    val ev = Tables(spark, dir, "events")
    val k = 16
    val whole = SketchOps.kmvSketch(ev, Seq("event_type"), "event_id", k)
    val parts = SketchOps.kmvSketch(
      ev.filter($"event_id" % 2 === 0), Seq("event_type"), "event_id", k)
      .union(SketchOps.kmvSketch(
        ev.filter($"event_id" % 2 === 1), Seq("event_type"), "event_id", k))
    val merged = SketchOps.kmvMerge(parts, Seq("event_type"), k)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type", $"kmv").as[(String, Seq[Long])]
        .collect().sortBy(_._1).toSeq
    assert(rows(merged) === rows(whole))
  }

  test("below k distinct values the sketch is exhaustive and the " +
    "estimate is exact; above k it lands within KMV error bounds") {
    val small = Seq.tabulate(40)(i => (i.toLong % 5, i.toLong))
      .toDF("g", "v")
    // 8 distinct v per group, k=16 -> exact
    val exact = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(small, Seq("g"), "v", 16), Seq("g"), 16)
      .select($"g", $"n_retained", $"n_distinct_est")
      .as[(Long, Int, Double)].collect()
    assert(exact.length === 5)
    assert(exact.forall { case (_, n, e) => n === 8 && e === 8.0 })
    // real column: 1000 distinct event_ids, k=64 -> σ ≈ 1/√62 ≈ 12.7%;
    // the hash is deterministic so this is a fixed number, asserted at
    // a generous 3σ
    val ev = Tables(spark, dir, "events")
    val est = SketchOps.kmvEstimate(
      SketchOps.kmvSketch(ev, Seq(), "event_id", 64), Seq(), 64)
      .select($"n_distinct_est").as[Double].head()
    val n = ev.select($"event_id").distinct().count().toDouble
    assert(math.abs(est - n) / n < 0.38, s"est $est vs exact $n")
  }

  test("qSketch: merge is lossless, below-k groups are exhaustive and " +
    "exact, estimates land within sample error, duplicate mass survives") {
    val ev = Tables(spark, dir, "events")
    val k = 64
    val whole = SketchOps.qSketch(ev, Seq("event_type"), "event_id", "value", k)
    val parts = SketchOps.qSketch(
      ev.filter($"event_id" % 2 === 0), Seq("event_type"), "event_id",
      "value", k)
      .union(SketchOps.qSketch(
        ev.filter($"event_id" % 2 === 1), Seq("event_type"), "event_id",
        "value", k))
    val merged = SketchOps.qMerge(parts, Seq("event_type"), k)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type", $"qsk".cast("array<struct<h:long,v:double>>"))
        .as[(String, Seq[(Long, Double)])].collect().sortBy(_._1).toSeq
    assert(rows(merged) === rows(whole))
    // a group smaller than k retains every row, so the q=1.0 estimate
    // IS the exact max and q=0 the exact min
    val tiny = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0))
      .toDF("g", "id", "v")
    val est = SketchOps.qEstimate(
      SketchOps.qSketch(tiny, Seq("g"), "id", "v", k = 8),
      Seq("g"), Seq(0.0, 0.5, 1.0))
      .select($"q", $"est").as[(Double, Double)].collect().toMap
    assert(est(0.0) === 10.0 && est(1.0) === 30.0)
    assert(est(0.5) === 20.0) // ceil(0.5 * 3) = 2nd of sorted (10,20,30)
    // duplicate-value mass: 9 copies of 1.0 and one 100.0 — the median
    // must be 1.0, which a distinct-value sample would miss
    val dup = ((1L to 9L).map(i => ("d", i, 1.0)) :+ (("d", 10L, 100.0)))
      .toDF("g", "id", "v")
    val dupEst = SketchOps.qEstimate(
      SketchOps.qSketch(dup, Seq("g"), "id", "v", k = 16),
      Seq("g"), Seq(0.5)).select($"est").as[Double].head()
    assert(dupEst === 1.0)
    // on the real column, a k=64 sample median lands inside the exact
    // p25..p75 band (deterministic — fixed hashes, no flake)
    val bands = ev.groupBy($"event_type")
      .agg(percentile($"value", lit(0.25)).as("lo"),
        percentile($"value", lit(0.75)).as("hi"))
    val med = SketchOps.qEstimate(whole, Seq("event_type"), Seq(0.5))
    val joined = med.join(bands, "event_type")
      .select($"event_type", $"est", $"lo", $"hi")
      .as[(String, Double, Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (g, est0, lo, hi) =>
      assert(est0 >= lo && est0 <= hi, s"group $g: $est0 not in [$lo, $hi]")
    }
  }

  test("CMS: estimates never underestimate, are exact without " +
    "collisions, and per-part sketches merge into the whole's sketch") {
    val ev = Tables(spark, dir, "events")
    val (d, w) = (4, 64)
    val whole = SketchOps.cmsSketch(ev, Nil, "user_id", d, w)
    val users = ev.select($"user_id").distinct()
    val est = SketchOps.cmsEstimate(users, whole, Nil, "user_id", d, w)
      .as[(Long, Long)].collect().toMap
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((u, n) <- exact) assert(est(u) >= n, s"user $u under-estimated")
    // sketch counters conserve mass: every depth row sums to the corpus
    val total = ev.count()
    val perDepth = whole.groupBy($"depth_no")
      .agg(sum($"cnt").as("s")).select($"s").as[Long].collect()
    assert(perDepth.length === d && perDepth.forall(_ === total))
    // merge algebra: per-part sketches fold into exactly the whole's
    val parts = SketchOps.cmsSketch(
      ev.filter($"event_id" % 2 === 0), Nil, "user_id", d, w)
      .union(SketchOps.cmsSketch(
        ev.filter($"event_id" % 2 === 1), Nil, "user_id", d, w))
    val merged = SketchOps.cmsMerge(parts, Nil)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"depth_no", $"bucket", $"cnt").as[(Int, Int, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(merged) === rows(whole))
    // a value the sketch never saw estimates 0 (absent counter short-
    // circuits the min) unless every one of its buckets collides
    val unseen = SketchOps.cmsEstimate(
      Seq(Tuple1(-999999L)).toDF("user_id"), whole, Nil, "user_id", d, w)
      .select($"est_freq").as[Long].head()
    assert(unseen >= 0L)
  }

  test("bloom: no false negatives ever, false positives near fpp, empty " +
    "build contains nothing, SQL scalar-subquery form agrees, guards") {
    val keys = spark.range(0, 1000).toDF("k")
    val bloom = SketchOps.bloomBuild(keys, xxhash64($"k"), 1000, 0.01)
    // every inserted key must probe true — Bloom's hard guarantee
    val misses = keys
      .where(!SketchOps.bloomMightContain(bloom, xxhash64($"k"))).count()
    assert(misses === 0)
    // disjoint probes: fp rate should be near 1% (generous ceiling 5%)
    val fp = spark.range(10000, 30000).toDF("k")
      .where(SketchOps.bloomMightContain(bloom, xxhash64($"k"))).count()
    assert(fp < 1000, s"false-positive rate ${fp / 20000.0} far above fpp")
    // empty input: a filter that contains nothing
    val none = SketchOps.bloomBuild(
      keys.where($"k" < 0), xxhash64($"k"), 100, 0.01)
    assert(keys.where(
      SketchOps.bloomMightContain(none, xxhash64($"k"))).count() === 0)
    // the SQL surface (graft_bloom_agg via scalar subquery) matches
    keys.createOrReplaceTempView("bloom_keys")
    val sqlMisses = spark.sql("""
      SELECT count(*) AS c FROM bloom_keys
      WHERE NOT graft_bloom_might_contain(
        (SELECT graft_bloom_agg(xxhash64(k), 1000L, 9585L) FROM bloom_keys),
        xxhash64(k))""").head().getLong(0)
    assert(sqlMisses === 0)
    intercept[IllegalArgumentException] {
      SketchOps.bloomBuild(keys, xxhash64($"k"), 0, 0.01)
    }
    intercept[IllegalArgumentException] {
      SketchOps.bloomBuild(keys, xxhash64($"k"), 10, 1.5)
    }
    intercept[IllegalArgumentException] {
      SketchOps.bloomMightContain(Array.emptyByteArray, xxhash64($"k"))
    }
  }

  test("bloomFlagContaminated == flagContaminated on real data") {
    import graft.operators.DedupOps
    val docs = Tables(spark, dir, "documents")
    val bench = docs.filter($"doc_id" % 50 === 0)
    val a = DedupOps.flagContaminated(docs, bench, "doc_id", "text")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = DedupOps.bloomFlagContaminated(docs, bench, "doc_id", "text",
      expectedShingles = 1L << 14)
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a.exists(_._2) && a.exists(!_._2))
  }

  test("Misra-Gries: the deterministic bracket holds for every retained " +
    "item (est ≤ true ≤ est + mg_err), mg_err ≤ n/k, every item above " +
    "mg_err is retained, and the merge algebra keeps ALL of it over a " +
    "3-way split — the summed-error bound") {
    val ev = Tables(spark, dir, "events")
    val k = 8 // 150 users per type → real trimming
    val keys = Seq("event_type")
    val exact = ev.groupBy($"event_type", $"user_id".cast("string").as("item"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (g, i, n) => (g, i) -> n }.toMap
    def check(sk: org.apache.spark.sql.DataFrame,
        truth: Map[(String, String), Long]): Unit = {
      val rows = SketchOps.mgEstimate(sk, keys)
        .as[(String, String, Long, Long, Long)].collect()
      val meta = sk.select($"event_type", $"mg_err", $"mg_n")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
        .toMap
      // bracket + bound
      rows.foreach { case (g, item, lo, hi, n) =>
        val t = truth((g, item))
        assert(lo <= t && t <= hi, s"($g,$item): [$lo,$hi] vs true $t")
        assert(hi === lo + meta(g)._1)
        assert(n === meta(g)._2)
      }
      meta.foreach { case (g, (err, n)) =>
        assert(err <= n / k, s"$g: err $err > n/k ${n / k}")
        assert(n === truth.collect { case ((gg, _), c) if gg == g => c }.sum)
      }
      // completeness: true > mg_err ⇒ retained
      val retained = rows.map(r => (r._1, r._2)).toSet
      truth.foreach { case ((g, item), t) =>
        if (t > meta(g)._1)
          assert(retained((g, item)), s"($g,$item) true=$t > err, missing")
      }
      // ≤ k−1 counters per group
      rows.groupBy(_._1).foreach { case (g, rs) =>
        assert(rs.length <= k - 1, s"$g kept ${rs.length}")
      }
    }
    check(SketchOps.mgSketch(ev, keys, "user_id", k), exact)
    // merge: three disjoint per-part builds fold into one summary that
    // still satisfies every bound against the UNION's truth
    val parts = (0 until 3).map(r =>
      SketchOps.mgSketch(ev.filter($"event_id" % 3 === r), keys,
        "user_id", k)).reduce(_ union _)
    check(SketchOps.mgMerge(parts, keys, k), exact)
    // empty-summary groups survive the merge with mg = []
    val uniform = Seq.tabulate(12)(i => (1L, i.toLong % 4))
      .toDF("g", "v") // 4 items × 3 each, k=4 → all trimmed
    val sk = SketchOps.mgSketch(uniform, Seq("g"), "v", 4)
    assert(sk.select(size($"mg")).as[Int].head() === 0)
    val m = SketchOps.mgMerge(sk.union(sk), Seq("g"), 4)
    assert(m.count() === 1 &&
      m.select($"mg_n").as[Long].head() === 24L)
    intercept[IllegalArgumentException] {
      SketchOps.mgSketch(uniform, Seq("g"), "v", 1)
    }
    intercept[IllegalArgumentException] {
      SketchOps.mgSketch(uniform.withColumn("mg_n", lit(1)), Seq("g"),
        "v", 4)
    }
  }

  test("HLL: merged per-part sketches equal the whole-corpus build " +
    "register-for-register, and the merge is idempotent") {
    val ev = Tables(spark, dir, "events")
    val keys = Seq("event_type")
    val whole = SketchOps.hllSketch(ev, keys, "user_id")
    val parts = SketchOps.hllSketch(
      ev.filter($"event_id" % 2 === 0), keys, "user_id")
      .union(SketchOps.hllSketch(
        ev.filter($"event_id" % 2 === 1), keys, "user_id"))
    val merged = SketchOps.hllMerge(parts, keys)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type", $"regs").as[(String, Seq[Int])]
        .collect().sortBy(_._1).toSeq
    assert(rows(merged) === rows(whole))
    // max is idempotent: folding the merged sketch with itself changes
    // nothing — the replay-safety property streaming folds rely on
    assert(rows(SketchOps.hllMerge(merged.union(merged), keys))
      === rows(whole))
    // layout: always exactly m registers, each within the rho range
    assert(rows(whole).forall { case (_, r) =>
      r.length === 64 && r.forall(v => v >= 0 && v <= 55) })
  }

  test("HLL: estimator lands within error bounds in the raw regime and " +
    "tracks tiny cardinalities through linear counting") {
    val ev = Tables(spark, dir, "events")
    // raw regime: distinct user_ids, σ ≈ 1.04/√64 ≈ 13% — deterministic
    // hash makes the estimate a fixed number, asserted at 3σ
    val est = SketchOps.hllEstimate(
      SketchOps.hllSketch(ev, Seq(), "user_id"), Seq())
      .select($"n_distinct_est").as[Double].head()
    val n = ev.select($"user_id").distinct().count().toDouble
    assert(math.abs(est - n) / n < 0.39, s"est $est vs exact $n")
    // linear-counting regime: 3 distinct values -> 61 zero registers,
    // estimate m·ln(m/V) ≈ 3.07
    val tiny = Seq.tabulate(30)(i => (1L, (i % 3).toLong)).toDF("g", "v")
    val (zeros, tinyEst) = SketchOps.hllEstimate(
      SketchOps.hllSketch(tiny, Seq("g"), "v"), Seq("g"))
      .select($"n_zero_regs", $"n_distinct_est")
      .as[(Int, Double)].head()
    assert(zeros === 61)
    assert(math.abs(tinyEst - 3.0) < 1.0, s"linear-counting est $tinyEst")
  }

  test("kmvAlgebra: exact below k, and the estimators hit the known " +
    "degenerate cases (disjoint -> 0, identical -> union)") {
    val k = 32
    // A = {0..19}, B = {10..29}: union 30 < k -> every estimate exact
    val a = Seq.tabulate(20)(i => (1L, i.toLong)).toDF("g", "v")
    val b = Seq.tabulate(20)(i => (1L, (i + 10).toLong)).toDF("g", "v")
    val alg = SketchOps.kmvAlgebra(
      SketchOps.kmvSketch(a, Seq("g"), "v", k),
      SketchOps.kmvSketch(b, Seq("g"), "v", k),
      Seq("g"), k)
      .select($"n_union_retained", $"union_est", $"jaccard_est",
        $"intersect_est")
      .as[(Int, Double, Double, Double)].head()
    assert(alg === ((30, 30.0, 0.333333, 10.0)))
    // disjoint sets
    val c = Seq.tabulate(20)(i => (1L, (i + 100).toLong)).toDF("g", "v")
    val dis = SketchOps.kmvAlgebra(
      SketchOps.kmvSketch(a, Seq("g"), "v", k),
      SketchOps.kmvSketch(c, Seq("g"), "v", k),
      Seq("g"), k)
      .select($"jaccard_est", $"intersect_est")
      .as[(Double, Double)].head()
    assert(dis === ((0.0, 0.0)))
    // identical sets: jaccard 1, intersection == union
    val same = SketchOps.kmvAlgebra(
      SketchOps.kmvSketch(a, Seq("g"), "v", k),
      SketchOps.kmvSketch(a, Seq("g"), "v", k),
      Seq("g"), k)
      .select($"union_est", $"jaccard_est", $"intersect_est")
      .as[(Double, Double, Double)].head()
    assert(same._2 === 1.0)
    assert(same._3 === same._1)
    // above-k regime on a real column: estimates within 3σ of truth
    val ev = Tables(spark, dir, "events")
    val ea = SketchOps.kmvSketch(
      ev.filter($"event_id" % 2 === 0), Seq(), "user_id", 64)
    val eb = SketchOps.kmvSketch(
      ev.filter($"event_id" % 2 === 1), Seq(), "user_id", 64)
    val ua = ev.filter($"event_id" % 2 === 0)
      .select($"user_id").distinct()
    val ub = ev.filter($"event_id" % 2 === 1)
      .select($"user_id").distinct()
    val exactU = ua.union(ub).distinct().count().toDouble
    val exactI = ua.intersect(ub).count().toDouble
    val (uEst, iEst) = SketchOps.kmvAlgebra(ea, eb, Seq(), 64)
      .select($"union_est", $"intersect_est")
      .as[(Double, Double)].head()
    assert(math.abs(uEst - exactU) / exactU < 0.39,
      s"union $uEst vs $exactU")
    assert(math.abs(iEst - exactI) / math.max(exactI, 1.0) < 0.6,
      s"intersect $iEst vs $exactI")
  }

  test("cmsJoinSize: never underestimates the true equi-join size, is " +
    "exact without collisions, and per-part sketches folded by cmsMerge " +
    "estimate identically to whole builds") {
    // skewed left side (value v appears v times), two-valued right side
    val left = (1L to 12L).flatMap(v => Seq.fill(v.toInt)(v)).toDF("v")
    val right = (1L to 12L).flatMap(v =>
      if (v % 3 == 0) Seq(v, v) else Seq(v)).toDF("v")
    val exact = left.join(right, "v").count()
    // wide sketch: 4x64 over 12 distinct values — estimate must still
    // satisfy the >= bound, and typically equals exact here
    val skA = SketchOps.cmsSketch(left, Nil, "v", 4, 64)
    val skB = SketchOps.cmsSketch(right, Nil, "v", 4, 64)
    val est = SketchOps.cmsJoinSize(skA, skB, Nil)
      .select($"est_join_size").as[Long].head()
    assert(est >= exact, s"est $est < exact $exact")
    // narrow sketch (forced collisions): the bound must still hold
    val estNarrow = SketchOps.cmsJoinSize(
      SketchOps.cmsSketch(left, Nil, "v", 2, 4),
      SketchOps.cmsSketch(right, Nil, "v", 2, 4), Nil)
      .select($"est_join_size").as[Long].head()
    assert(estNarrow >= exact, s"narrow est $estNarrow < exact $exact")
    // mergeability: disjoint-half builds folded by cmsMerge give the
    // same inner products as the whole-table build
    val halves = SketchOps.cmsSketch(
      left.filter($"v" % 2 === 0), Nil, "v", 4, 64)
      .union(SketchOps.cmsSketch(
        left.filter($"v" % 2 === 1), Nil, "v", 4, 64))
    val estMerged = SketchOps.cmsJoinSize(
      SketchOps.cmsMerge(halves, Nil), skB, Nil)
      .select($"est_join_size").as[Long].head()
    assert(estMerged === est)
  }

  test("guards: k below 2 and reserved columns fail fast") {
    val df = Seq((1L, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      SketchOps.kmvSketch(df, Seq("g"), "v", 1)
    }
    intercept[IllegalArgumentException] {
      SketchOps.hllSketch(df.withColumn("regs", lit(1)), Seq("g"), "v")
    }
    intercept[IllegalArgumentException] {
      SketchOps.kmvAlgebra(
        Seq((1L, Seq(1L))).toDF("g", "kmv"),
        Seq((1L, Seq(2L))).toDF("g", "kmv"), Seq("g"), 1)
    }
    intercept[IllegalArgumentException] {
      SketchOps.kmvSketch(df.withColumn("__h", lit(1)), Seq("g"), "v", 4)
    }
    intercept[IllegalArgumentException] {
      SketchOps.cmsSketch(df, Seq("g"), "v", 0, 64)
    }
    intercept[IllegalArgumentException] {
      SketchOps.cmsSketch(df, Seq("g"), "v", 4, 1)
    }
    intercept[IllegalArgumentException] {
      SketchOps.cmsSketch(df.withColumn("cnt", lit(1)), Seq("g"), "v", 4, 8)
    }
  }
}
