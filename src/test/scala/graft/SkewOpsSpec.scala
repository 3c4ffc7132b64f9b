package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Salting must be invisible in the RESULT (bit-equal to the plain
  * join, every supported join type) and visible in the PLAN (the join
  * runs on (key, salt), the replicated side fans out `salts` x).
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def plain(joinType: String) = {
    val li = Tables(spark, dir, "lineitem")
    val ords = Tables(spark, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    li.join(ords, Seq("l_orderkey"), joinType)
  }

  private def salted(joinType: String, salts: Int = 4) = {
    val li = Tables(spark, dir, "lineitem")
    val ords = Tables(spark, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    SkewOps.saltedJoin(li, ords, Seq("l_orderkey"),
      saltFrom = struct($"l_orderkey", $"l_linenumber"), salts = salts,
      joinType = joinType)
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted inner/left_outer joins == plain joins, with broadcast " +
    "disabled (the regime salting exists for)") {
    withNoBroadcast {
      for (jt <- Seq("inner", "left_outer")) {
        val got = salted(jt)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect().toMap
        val want = plain(jt)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect().toMap
        assert(got === want, s"joinType=$jt")
      }
    }
  }

  test("left_semi keeps each left row at most once (replication never " +
    "multiplies the probe side); left_anti matches the plain anti set") {
    withNoBroadcast {
      val semi = salted("left_semi").count()
      assert(semi === plain("left_semi").count())
      // anti on a foreign key that always matches -> empty, and must
      // stay empty after salting (a salt-mismatch bug would leak rows)
      assert(salted("left_anti").count() === plain("left_anti").count())
    }
  }

  test("the join runs on (key, salt): salts land 0..n-1 and spread a " +
    "single hot key across cells") {
    val li = Tables(spark, dir, "lineitem").limit(500)
      .withColumn("hot", lit(1))
    val dim = Seq((1, "x")).toDF("hot", "v")
    val out = SkewOps.saltedJoin(li, dim, Seq("hot"),
      saltFrom = struct($"l_orderkey", $"l_linenumber"), salts = 8)
    assert(out.count() === 500)
    // restate the salt derivation: all 8 cells used on 500 rows
    val cells = li.select(
      pmod(xxhash64(struct($"l_orderkey", $"l_linenumber")), lit(8L))
        .cast("int").as("s"))
      .distinct().as[Int].collect().toSet
    assert(cells === (0 until 8).toSet)
  }

  test("misuse fails fast: right/full joins, zero salts, reserved column") {
    val a = Seq((1, "a")).toDF("k", "x")
    val b = Seq((1, "b")).toDF("k", "y")
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(a, b, Seq("k"), $"x", 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(a, b, Seq("k"), $"x", 0)
    }
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(a.withColumn("__salt", lit(1)), b, Seq("k"), $"x", 4)
    }
  }

  test("skewProfile: hand-checked occupancy/share/skew, deterministic " +
    "tie cut, guards") {
    // key 1 x6, key 2 x2, keys 3..6 x1 each -> 12 rows, 6 keys, mean 2
    val rows = Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ (3 to 6)
    val df = rows.map(k => (k, "p")).toDF("k", "payload")
    val got = SkewOps.skewProfile(df, Seq("k"), topK = 3)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1, 6L, 0.5, 3.0),      // 6/12; 6/(12/6)
      (2, 2L, 0.166667, 1.0),
      (3, 1L, 0.083333, 0.5))) // ties among 3..6 cut by key order: 3 wins
    intercept[IllegalArgumentException] {
      SkewOps.skewProfile(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      SkewOps.skewProfile(df.withColumnRenamed("payload", "share"), Seq("k"))
    }
  }

  test("graft_mg_top1: exact mode whenever a key dominates, deterministic " +
    "lexicographic tie, null-only group -> null, bounded on wide keys") {
    // hot key 'h' at 60% share over 8 partitions (merge + serialize
    // paths both exercised), cold tail of 400 distinct values — the
    // high-cardinality regime mode() was unbounded in (ADVICE r16)
    val rows = Seq.fill(600)("h") ++ (0 until 400).map(i => f"cold_$i%04d")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val got = df.selectExpr("graft_mg_top1(v, 32)").as[String].head()
    assert(got === "h",
      "a 60%-share key must be the MG top-1 (the >= 1/k retention " +
        "guarantee plus dominance)")
    // exact two-way tie, 31-counter summary holds both: smaller string
    val tie = (Seq.fill(5)("bb") ++ Seq.fill(5)("aa")).toDF("v")
    assert(tie.selectExpr("graft_mg_top1(v, 32)").as[String].head() === "aa")
    // all-null input -> null (mode() contract)
    val nul = Seq[Option[String]](None, None).toDF("v")
    assert(nul.selectExpr("graft_mg_top1(v, 32)").as[String].head() === null)
    // k must be a literal >= 2
    intercept[Exception] { spark.sql("SELECT graft_mg_top1('a', 1)").collect() }
  }

  test("observeProfile rides a high-cardinality feed with the bounded " +
    "sketch and still lands the exact >= 50%-share hot key") {
    // 5000 distinct cold keys + one 55%-share hot key: the profile must
    // count the hot share EXACTLY (sum-when) and the sketch must name
    // the hot key as the observed mode
    val cold = spark.range(5000).select(concat(lit("c"), $"id").as("site_no"))
    val hot = spark.range(6100).select(lit("hotsite").as("site_no"))
    val feed = cold.unionByName(hot).repartition(8)
    val prior = SkewOps.SkewProfile(
      Seq("site_no"), Seq("hotsite"), 0.55, 11100L)
    val (observed, obs) = SkewOps.observeProfile(
      feed, Seq("site_no"), Some(prior))
    observed.count() // the caller's action the metrics ride
    val p = SkewOps.refreshProfile(spark,
      tempDirFile("graft_mgprof_").getAbsolutePath + "/p",
      Seq("site_no"), Some(prior), obs)
    assert(p.isDefined)
    assert(p.get.hotKey === Seq("hotsite"),
      "MG top-1 must surface the dominant key on a wide-cardinality feed")
    assert(p.get.share === math.round(6100.0 / 11100.0 * 1e6) / 1e6,
      "the share must stay EXACT (it is the sum-when counter, not the sketch)")
    assert(p.get.total === 11100L)
  }

  test("multi-key profile observation flattens nulls to empty string: " +
    "(a, null) and (a, '') COLLIDE — documented profile heuristic, " +
    "never join semantics (VERDICT r18 advisory 3)") {
    // the flattened observable (keyStr) maps null -> "" like concat_ws,
    // so a stored hot key ("a","") counts rows of BOTH ("a",null) and
    // ("a",""). Fine for a plan-steering share estimate (the collision
    // can only merge two variants of the same leading key); this pin
    // exists so any future use of multi-key profiles for SEMANTICS
    // (not plans) trips here first
    val df = spark.range(600).select(lit("a").as("k1"),
        when($"id" < 300, lit(null).cast("string")).otherwise(lit(""))
          .as("k2"))
      .unionByName(spark.range(400).select(lit("b").as("k1"),
        lit("x").as("k2")))
    val prior = SkewOps.SkewProfile(
      Seq("k1", "k2"), Seq("a", ""), 0.6, 1000L)
    val (observed, obs) = SkewOps.observeProfile(
      df, Seq("k1", "k2"), Some(prior))
    observed.count()
    val p = SkewOps.refreshProfile(spark,
      tempDirFile("graft_nullkey_").getAbsolutePath + "/p",
      Seq("k1", "k2"), Some(prior), obs)
    assert(p.isDefined && p.get.share === 0.6,
      "the ('a',null) rows fold into the ('a','') counter — the " +
        s"collision is the documented behavior, got ${p.map(_.share)}")
  }

  test("no-skew high-cardinality feed: an arbitrary near-tie mode becomes " +
    "a bounded CANDIDATE, never a share = -1 invalidation (ADVICE r17)") {
    // ~uniform feed, 500 keys x 20 rows: the MG top-1 is an arbitrary
    // near-tie winner. The refresh must KEEP the exact no-skew profile
    // (share stays measured, hotKey stays the stored key) and record the
    // observed modes as candidates for exact counting next cycle — the
    // old rule re-measured the full corpus every cadence on exactly
    // this feed class
    val feed = spark.range(10000)
      .select(concat(lit("k"), $"id" % 500).as("site_no")).repartition(8)
    val prior = SkewOps.SkewProfile(
      Seq("site_no"), Seq("k7"), 0.002, 10000L)
    val (observed, obs) = SkewOps.observeProfile(
      feed, Seq("site_no"), Some(prior))
    observed.count()
    val dir = tempDirFile("graft_noskew_").getAbsolutePath + "/p"
    val p = SkewOps.refreshProfile(spark, dir,
      Seq("site_no"), Some(prior), obs).get
    assert(p.share >= 0.0, s"no-skew profile must never degrade, got $p")
    assert(p.hotKey === Seq("k7"),
      "the exactly-counted stored key stays the profile's hot key")
    assert(p.share === 0.002, "k7's share is the exact sum-when count")
    assert(p.candidates.nonEmpty &&
      p.candidates.size <= SkewOps.MaxCandidates,
      s"observed modes become bounded candidates, got ${p.candidates}")
    // round-trip: the candidate list survives the sidecar
    assert(SkewOps.readProfile(spark, dir).get === p)
  }

  test("a genuinely MOVED hot key converges through the candidate " +
    "counter — exact share, zero dedicated scans — while live stakes " +
    "still degrade to a re-measure") {
    // feed: new hot key 'newhot' at 60%, stored profile still claims
    // a long-gone 'oldhot' with a tiny share (a cooled hot key, not a
    // live one). Cycle 1: mode = newhot is uncounted but stakes are
    // cold -> kept profile carries newhot as a candidate. Cycle 2: the
    // candidate's sum-when counter lands the EXACT 60% share and
    // newhot is promoted to the hot key.
    val cold = spark.range(4000)
      .select(concat(lit("c"), $"id").as("site_no"))
    val hot = spark.range(6000).select(lit("newhot").as("site_no"))
    val feed = cold.unionByName(hot).repartition(8)
    val dir = tempDirFile("graft_moved_").getAbsolutePath + "/p"
    val prior = SkewOps.SkewProfile(
      Seq("site_no"), Seq("oldhot"), 0.01, 10000L)
    val (o1, obs1) = SkewOps.observeProfile(feed, Seq("site_no"), Some(prior))
    o1.count()
    val p1 = SkewOps.refreshProfile(spark, dir,
      Seq("site_no"), Some(prior), obs1).get
    assert(p1.share >= 0.0 && p1.candidates.contains(Seq("newhot")),
      s"cold-stakes mode move must carry the candidate, got $p1")
    val (o2, obs2) = SkewOps.observeProfile(feed, Seq("site_no"), Some(p1))
    o2.count()
    val p2 = SkewOps.refreshProfile(spark, dir,
      Seq("site_no"), Some(p1), obs2).get
    assert(p2.hotKey === Seq("newhot"),
      s"the exactly-counted candidate must be promoted, got $p2")
    assert(p2.share === 0.6, "the promoted share is exact (6000/10000)")
    // live stakes: the same uncounted mode with a stored share at the
    // decision scale must re-measure (the ambiguity could flip a plan)
    val hotPrior = SkewOps.SkewProfile(
      Seq("site_no"), Seq("oldhot"), 0.9, 10000L)
    val (o3, obs3) = SkewOps.observeProfile(feed, Seq("site_no"),
      Some(hotPrior))
    o3.count()
    val p3 = SkewOps.refreshProfile(spark, dir,
      Seq("site_no"), Some(hotPrior), obs3).get
    assert(p3.share === -1.0 && p3.hotKey === Seq("newhot"),
      s"live-stakes mode move must degrade to a re-measure, got $p3")
  }

  test("hotKeyProfile + engages: TWO comparable hot sites engage through " +
    "the summed qualified share; a uniform feed qualifies nothing " +
    "(VERDICT r17 item 7)") {
    // 2 hot keys at ~35% each + 30 cold keys sharing the rest: neither
    // hot key clears a 0.5 top-1 threshold alone, their qualified sum
    // (~0.7) does; every hot key's skew is ~11x the mean — far over
    // the 4x qualification bar
    val hot = spark.range(7000)
      .select(concat(lit("h"), $"id" % 2).as("site_no"))
    val cold = spark.range(3000)
      .select(concat(lit("c"), $"id" % 30).as("site_no"))
    val two = hot.unionByName(cold).repartition(8)
    val p2 = SkewOps.hotKeyProfile(two, Seq("site_no"))
    assert(p2.share < 0.5 && p2.share > 0.3)
    assert(p2.hotSet.size === 2 &&
      p2.hotSet.toSet === Set(Seq("h0"), Seq("h1")),
      s"both comparable hot sites must qualify, got ${p2.hotSet}")
    assert(p2.hotSetShare > 0.5 && !SkewOps.engages(p2, 0.75))
    assert(SkewOps.engages(p2, 0.5),
      "summed qualified share must engage what no single key can")
    // uniform: skew ~1 everywhere -> empty hot set, never engages
    val uni = spark.range(10000)
      .select(concat(lit("u"), $"id" % 10).as("site_no"))
    val pu = SkewOps.hotKeyProfile(uni, Seq("site_no"))
    assert(pu.hotSet.isEmpty && pu.hotSetShare === 0.0)
    assert(!SkewOps.engages(pu, 0.5))
    // uniform LOW-cardinality (ADVICE r18): 3 keys at ~33% each clear
    // the bare 0.3 share floor and would sum to ~1.0, but skew ~1
    // everywhere — no key outweighs the average, no pile-up exists,
    // and the SoloMinSkew co-requirement must reject all of them
    val uni3 = spark.range(9000)
      .select(concat(lit("u"), $"id" % 3).as("site_no"))
    val pu3 = SkewOps.hotKeyProfile(uni3, Seq("site_no"))
    assert(pu3.hotSet.isEmpty && pu3.hotSetShare === 0.0,
      s"uniform 3-key feed must qualify no keys through the share " +
        s"floor, got hotSet=${pu3.hotSet} sum=${pu3.hotSetShare}")
    assert(!SkewOps.engages(pu3, 0.5) && !SkewOps.engages(pu3, 1.0))
    assert(pu3.total === 9000L,
      "total must be the exact __total counter, not a share-derived " +
        s"estimate (ADVICE r18), got ${pu3.total}")
    // genuinely IMBALANCED low-cardinality: 45/45/10 among 3 keys —
    // skew 1.35 per hot key (a 1.5 bar would wrongly reject this real
    // two-task pile-up; the 1.25 bar = "25% over uniform occupancy"
    // admits it while still rejecting uniform's 1.0)
    val imb3 = spark.range(10000)
      .select(when($"id" < 4500, "h0").when($"id" < 9000, "h1")
        .otherwise(lit("c0")).as("site_no"))
    val pi3 = SkewOps.hotKeyProfile(imb3, Seq("site_no"))
    assert(pi3.hotSet.toSet === Set(Seq("h0"), Seq("h1")),
      s"both 45%-share keys must qualify at skew 1.35, got ${pi3.hotSet}")
    assert(pi3.hotSetShare === 0.9 && SkewOps.engages(pi3, 0.5))
    // LOW-cardinality two-hot (the SoloQualifyShare arm): among only 5
    // keys the mean is dominated by the hot keys themselves, so their
    // skew-over-mean is ~2x — under the 4x factor — but each holds 40%
    // of all rows; the share floor must qualify them and the sum engage
    val low = spark.range(10000)
      .select(when($"id" < 4000, "h0").when($"id" < 8000, "h1")
        .otherwise(concat(lit("c"), $"id" % 3)).as("site_no"))
    val pl = SkewOps.hotKeyProfile(low, Seq("site_no"))
    assert(pl.share === 0.4 && pl.share < 0.5)
    assert(pl.hotSet.toSet === Set(Seq("h0"), Seq("h1")),
      s"share-floor arm must qualify both 40%-share keys, got ${pl.hotSet}")
    assert(pl.hotSetShare === 0.8 && SkewOps.engages(pl, 0.5))
    // single dominant key: unchanged top-1 arm
    val one = spark.range(10000)
      .select(when($"id" < 6000, "dom").otherwise(concat(lit("c"), $"id"))
        .as("site_no"))
    val po = SkewOps.hotKeyProfile(one, Seq("site_no"))
    assert(po.share === 0.6 && po.hotSet === Seq(Seq("dom")))
    assert(SkewOps.engages(po, 0.5))
  }

  test("graft_mg_topk: ranked multi-mode surface — count desc, ties " +
    "lexicographic, bounded, arity/type guards") {
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(300)("c") ++ (0 until 50).map(i => f"tail$i%02d")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val got = df.selectExpr("graft_mg_topk(v, 32, 3)")
      .as[Seq[String]].head()
    assert(got === Seq("a", "b", "c"),
      "top-3 by estimated count desc — deterministic given the same " +
        "multiset and partitioning")
    assert(df.selectExpr("graft_mg_topk(v, 32, 1)").as[Seq[String]].head()
      === Seq("a"))
    // empty group -> empty array, never null elements
    val empty = Seq.empty[String].toDF("v")
    assert(empty.selectExpr("graft_mg_topk(v, 32, 3)")
      .as[Seq[String]].collect().head === Seq.empty[String])
    intercept[Exception] {
      spark.sql("SELECT graft_mg_topk('a', 32)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_mg_topk('a', 32, 40)").collect()
    }
  }
}
