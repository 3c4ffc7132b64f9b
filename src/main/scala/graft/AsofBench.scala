package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The VERDICT r12 item-3 spike bench: union+window as-of
  * ([[graft.operators.TimeSeriesOps.asOfLookup]]) vs the bucketed
  * range-join form ([[graft.operators.AsofStrategies.asOfLookupBucketed]])
  * on (a) the production key distribution and (b) a pathological
  * single-hot-series fixture (one key holding ~50% of all rows — the
  * shape where the union form's per-key partitioning serializes into
  * one task).
  *
  * The events table is multiplied `SPARK_GRAFT_ASOF_MULT`× (default 50:
  * 5M left rows at sf0.1, replicas offset by seconds so timestamps stay
  * distinct) to make the window sorts big enough to measure; the right
  * feed is a deterministic 1-in-5 hash sample. Two timed passes, warm
  * pass reported first-class, one JSON line — Bench.scala's discipline.
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mult = sys.env.getOrElse("SPARK_GRAFT_ASOF_MULT", "50").toInt
    val bucketSecs =
      sys.env.getOrElse("SPARK_GRAFT_ASOF_BUCKET", "21600").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"value")
      .crossJoin(spark.range(mult.toLong).select($"id".as("__rep")))
      .withColumn("event_id", $"event_id" * mult + $"__rep")
      .withColumn("ts", expr("timestampadd(SECOND, __rep, ts)"))
      .drop("__rep")

    // ~50% of all rows collapse onto key 0; the rest keep disjoint keys
    val hot = ev.withColumn("user_id",
      when(pmod(xxhash64($"event_id"), lit(2)) === 0, lit(0L))
        .otherwise($"user_id" + 1000000L))

    def fixture(base: DataFrame): (DataFrame, DataFrame) = (
      base.select($"user_id", $"ts", $"event_id"),
      base.filter(pmod(xxhash64($"event_id"), lit(5)) === 0)
        .select($"user_id", $"ts".as("rt"), $"value"))

    def force(df: DataFrame): Unit = {
      df.select(bit_xor(xxhash64(df.columns.map(col).toSeq: _*))).collect()
      ()
    }
    val cases: Seq[(String, () => DataFrame)] = Seq(
      "uniform_union" -> { () =>
        val (l, r) = fixture(ev)
        graft.operators.TimeSeriesOps.asOfLookup(
          l, r, Seq("user_id"), "ts", "rt", Seq("value"))
      },
      "uniform_bucketed" -> { () =>
        val (l, r) = fixture(ev)
        graft.operators.AsofStrategies.asOfLookupBucketed(
          l, r, Seq("user_id"), "ts", "rt", Seq("value"),
          bucketSeconds = bucketSecs)
      },
      "hot50_union" -> { () =>
        val (l, r) = fixture(hot)
        graft.operators.TimeSeriesOps.asOfLookup(
          l, r, Seq("user_id"), "ts", "rt", Seq("value"))
      },
      "hot50_bucketed" -> { () =>
        val (l, r) = fixture(hot)
        graft.operators.AsofStrategies.asOfLookupBucketed(
          l, r, Seq("user_id"), "ts", "rt", Seq("value"),
          bucketSeconds = bucketSecs)
      })

    try force(cases.head._2()) catch { case _: Throwable => () } // warm-up
    def pass(): Seq[(String, Double)] = cases.map { case (name, mk) =>
      val t0 = System.nanoTime()
      val ok = try { force(mk()); true } catch { case e: Throwable =>
        System.err.println(s"[asof-bench] $name FAILED: ${e.getMessage}")
        false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = pass()
    val p2 = pass()
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"asof_spike","unit":"sec","sf":"$sfDir","mult":$mult,"bucket_seconds":$bucketSecs,"cpus":$cpus,"pass2":${fmt(p2)},"pass1":${fmt(p1)}}""")
    spark.stop()
  }
}
