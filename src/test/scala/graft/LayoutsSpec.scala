package graft

import graft.operators.Layouts
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once-join-free layout claim in
  * SCALE.md must hold in the executed plan, not just in prose.
  */
class LayoutsSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketing join runs with zero exchanges") {
    val d = java.nio.file.Files.createTempDirectory("graft_bucket_").toFile
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
}
