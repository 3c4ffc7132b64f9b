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
    val (observed, obs) = SkewOps.observeProfile(
      feed, Seq("site_no"), lastHot = Some(Seq("hotsite")))
    observed.count() // the caller's action the metrics ride
    val p = SkewOps.refreshProfile(spark,
      tempDirFile("graft_mgprof_").getAbsolutePath + "/p",
      Seq("site_no"), Some(Seq("hotsite")), obs)
    assert(p.isDefined)
    assert(p.get.hotKey === Seq("hotsite"),
      "MG top-1 must surface the dominant key on a wide-cardinality feed")
    assert(p.get.share === math.round(6100.0 / 11100.0 * 1e6) / 1e6,
      "the share must stay EXACT (it is the sum-when counter, not the sketch)")
    assert(p.get.total === 11100L)
  }
}
