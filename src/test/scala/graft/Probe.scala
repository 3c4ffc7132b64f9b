package graft

import graft.operators.LevelPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, dir, "events").count() // warm-up

    import graft.queries.PipelineQueries._
    val q = SparkEntry.queries
    time("pl-full-run1") { q("pl_levels_e2e")(spark, dir).count() }
    time("pl-full-run2") { q("pl_levels_e2e")(spark, dir).count() }

    val raw = rawDf(spark, dir)
    val l1 = LevelPipeline.level1(raw)
    time("l1-run2") { l1.count() }
    val stations = stationsDf(spark)
    val silo = siloDf(spark)
    val intensity = intensityDf(spark)
    time("silo+intensity") { silo.count(); intensity.count() }
    val l2 = LevelPipeline.level2(l1, stations, silo, intensity)
    time("l2-cum") { l2.count() }
    time("l2-cum-run2") { l2.count() }
    val l3 = LevelPipeline.level3(l2, stations)
    val l4 = LevelPipeline.level4(l3)
    time("l4-cum") { l4.count() }
    time("l4-cum-run2") { l4.count() }
    spark.stop()
  }
}
