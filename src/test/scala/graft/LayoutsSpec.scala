package graft

import graft.operators.Layouts
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once-join-free layout claim in
  * SCALE.md must hold in the executed plan, not just in prose.
  */
class LayoutsSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketing join runs with zero exchanges") {
    val d = tempDirFile("graft_bucket_")
    d.deleteOnExit()
    val left = (0 until 200).map(i => (i % 20, i.toLong, i * 1.5))
      .toDF("site_no", "row_id", "v")
    val right = (0 until 60).map(i => (i % 20, s"meta$i"))
      .toDF("site_no", "meta")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layouts.writeBucketed(left, "graft_bkt_left",
        d.getAbsolutePath + "/left", buckets = 4, Seq("site_no"))
      Layouts.writeBucketed(right, "graft_bkt_right",
        d.getAbsolutePath + "/right", buckets = 4, Seq("site_no"))
      val joined = Layouts.readTable(spark, "graft_bkt_left")
        .join(Layouts.readTable(spark, "graft_bkt_right"), "site_no")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and the answer is right
      assert(joined.count() === 600) // 200 rows x 3 metas per site
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("dynamic partition pruning: a filtered dim prunes the " +
    "partitioned fact's day directories at runtime — the 100 TB star " +
    "join reads only the matching partitions") {
    val d = tempDir("graft_dpp_")
    spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 10 AS INT) AS day")
      .write.partitionBy("day").mode("overwrite").parquet(s"$d/fact")
    val fact = spark.read.parquet(s"$d/fact")
    val dim = spark.range(0, 10)
      .selectExpr("CAST(id AS INT) AS day2", "CAST(id % 5 AS INT) AS grp")
    val joined = fact.join(dim.filter($"grp" === 0),
      $"day" === $"day2")
    // the fact scan's PartitionFilters must carry the runtime
    // dynamicpruning subquery fed by the dim's selective filter
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    assert(joined.count() === 200) // day ∈ {0, 5} → 2 of 10 partitions
  }

  test("zvalue: hand-checked interleave, clamping, nulls to min, guards") {
    def z(x: Long, y: Long, bits: Int, mx: Long): Long =
      Seq((x, y)).toDF("x", "y")
        .select(Layouts.zvalue(Seq($"x", $"y"), Seq(0L, 0L), Seq(mx, mx),
          bits).as("z"))
        .as[Long].head()
    // x=0b10 contributes bit1 -> position 1*2+0=2; y=0b01 -> position 0*2+1
    assert(z(2, 1, 2, 3) === 6)
    assert(z(0, 0, 2, 3) === 0)
    assert(z(3, 3, 2, 3) === 15) // all four interleaved bits set
    // clamp: out-of-range lands in the edge bin, never errors
    assert(z(99, -5, 2, 3) === z(3, 0, 2, 3))
    // null maps to min
    val zn = Seq((Some(2L), Option.empty[Long])).toDF("x", "y")
      .select(Layouts.zvalue(Seq($"x", $"y"), Seq(0L, 0L), Seq(3L, 3L),
        2).as("z")).as[Long].head()
    assert(zn === z(2, 0, 2, 3))
    // a wider range than bits drops low bits, order preserved
    assert(z(255, 0, 2, 255) === z(192, 0, 2, 255))
    intercept[IllegalArgumentException] {
      Layouts.zvalue(Seq($"x"), Seq(0L), Seq(3L, 4L), 2)
    }
    intercept[IllegalArgumentException] {
      Layouts.zvalue(Seq($"x", $"y"), Seq(0L, 0L), Seq(3L, 3L), 32)
    }
    intercept[IllegalArgumentException] {
      Layouts.zvalue(Seq($"x"), Seq(5L), Seq(3L), 2)
    }
  }

  test("zorder: per-file min/max footprints shrink on BOTH dimensions " +
    "vs the unsorted layout, and rows survive exactly") {
    val d = tempDirFile("graft_zorder_")
    d.deleteOnExit()
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val n = li.count()
    Layouts.zorder(li, Seq("l_orderkey", "l_partkey"), outPartitions = 8)
      .write.mode("overwrite").parquet(d.getAbsolutePath + "/z")
    li.repartition(8)
      .write.mode("overwrite").parquet(d.getAbsolutePath + "/plain")
    def meanFileSpread(path: String, c: String): Double = {
      val spreads = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("spread"))
        .select($"spread").as[Double].collect()
      spreads.sum / spreads.length
    }
    val zPath = d.getAbsolutePath + "/z"
    val pPath = d.getAbsolutePath + "/plain"
    assert(spark.read.parquet(zPath).count() === n)
    // BOTH dimensions must shrink (the MSB-aligned interleave splits
    // every dimension, not just the widest — the balance property)...
    val ratios = Seq("l_orderkey", "l_partkey").map { c =>
      val r = meanFileSpread(zPath, c) / meanFileSpread(pPath, c)
      assert(r < 0.8, s"$c: z-ordered/plain per-file spread ratio $r")
      r
    }
    // ...and the bounding-box AREA (what a point predicate's file-hit
    // probability follows) must collapse
    assert(ratios.product < 0.4,
      s"per-file bounding-box area ratio ${ratios.product} not < 0.4")
    // empty input passes through
    assert(Layouts.zorder(li.where($"l_orderkey" < 0),
      Seq("l_orderkey"), 4).count() === 0)
  }

  test("compactTable: file count collapses to the byte-derived target, " +
    "rows survive exactly, and a mid-swap crash self-heals both ways") {
    val d = tempDirFile("graft_ctable_")
    d.deleteOnExit()
    val p = d.getAbsolutePath + "/t"
    spark.range(0, 10000).toDF("id")
      .repartition(24).write.parquet(p)
    def files(): Int = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files() === 24)
    Layouts.compactTable(spark, p, targetFileBytes = 1L << 30) // 1 file
    assert(files() === 1, s"expected 1 file, got ${files()}")
    assert(spark.read.parquet(p).count() === 10000)
    intercept[IllegalArgumentException] {
      Layouts.compactTable(spark, p, 0L)
    }
    // crash state A: live gone, aside present -> roll back, then compact
    val src = new java.io.File(p)
    val old = new java.io.File(p + "_old")
    val tmp = new java.io.File(p + "_compacting")
    assert(src.renameTo(old))
    Layouts.compactTable(spark, p, 1L << 30)
    assert(src.exists && !old.exists && !tmp.exists)
    assert(spark.read.parquet(p).count() === 10000)
    // crash state B: live gone, complete staging present -> roll forward
    assert(src.renameTo(tmp))
    Layouts.compactTable(spark, p, 1L << 30)
    assert(src.exists && !old.exists && !tmp.exists)
    assert(spark.read.parquet(p).count() === 10000)
  }

  test("compactTableAdvised: advisor-driven compaction equals the " +
    "hand-tuned call on a skewed small-file fixture, a healthy table " +
    "is NOT rewritten, and the stats come from one listing") {
    val target = 4L * 1024 * 1024
    def mk(tag: String): String = {
      val p = tempDirFile(s"graft_cadv_$tag").getAbsolutePath + "/t"
      // skewed small-file geometry: 48 files, most near-empty
      spark.range(0, 200000).toDF("id")
        .withColumn("part", when($"id" < 190000, 0).otherwise($"id" % 47 + 1))
        .repartition(48, $"part").drop("part")
        .write.parquet(p)
      p
    }
    def files(p: String): Seq[java.io.File] = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
    val advisedPath = mk("a")
    val handPath = mk("b")
    val statsBefore = Layouts.layoutStats(spark, advisedPath, target)
    // hash-partitioning may leave some of the 48 slots empty (skipped
    // at write) — the point is MANY small files, not an exact count
    assert(statsBefore.files > 10 && statsBefore.files <= 48)
    assert(statsBefore.estFilesAtTarget ===
      math.max(1L, (statsBefore.bytes + target - 1) / target))
    val decided = Layouts.compactTableAdvised(spark, advisedPath, target)
    assert(decided.stats === statsBefore, "returned stats = the pre-rewrite read")
    assert(decided.rewrote, "an unhealthy table must report rewrote = true")
    Layouts.compactTable(spark, handPath, target) // the hand-tuned twin
    assert(files(advisedPath).size === files(handPath).size,
      "advisor-driven file geometry must equal the hand-tuned call's")
    assert(spark.read.parquet(advisedPath).count() === 200000)
    // healthy table: advised call is a no-op (same file inodes survive)
    val namesBefore = files(advisedPath).map(_.getName)
    val after = Layouts.compactTableAdvised(spark, advisedPath, target)
    assert(!after.rewrote, "a healthy table must report rewrote = false")
    assert(after.stats.files === after.stats.estFilesAtTarget)
    assert(files(advisedPath).map(_.getName) === namesBefore,
      "a table already at target geometry must not be rewritten")
    intercept[IllegalArgumentException] {
      Layouts.layoutStats(spark, advisedPath, 0L)
    }
  }

  test("zorder: an ALL-NULL z-column degrades to a zero-bit range — the " +
    "other columns still cluster instead of the layout silently skipping") {
    val df = spark.range(0, 1024).toDF("a")
      .withColumn("b", lit(null).cast("long"))
    val out = Layouts.zorder(df, Seq("a", "b"), outPartitions = 4)
    assert(out.count() === 1024) // rows survive
    // the live column still clusters: each range partition holds a
    // contiguous, disjoint slice of `a`
    import org.apache.spark.sql.functions.spark_partition_id
    val spans = out
      .groupBy(spark_partition_id().as("p"))
      .agg(min($"a").as("lo"), max($"a").as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(spans.map(_._3).sum === 1024L)
    spans.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"partitions overlap on `a`: $spans")
      case _ =>
    }
  }
}
