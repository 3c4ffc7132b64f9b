package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare honest:
  *   - every float output is `round(<exact arithmetic> , n)` so Spark and
  *     DuckDB produce bit-identical doubles;
  *   - every query ends with a total ORDER BY (unique tie-break column);
  *   - aggregate/computed columns carry the same alias on both sides.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    doc: String = "")

/** A module of queries (one per SURVEY.md §2 operator family). */
trait QueryModule {
  def queries: Map[String, Q]
}

object Tables {

  /** Read one driver test table. The events table stores TIMESTAMP(NANOS),
    * which Spark only reads as raw nanos (spark.sql.legacy.parquet
    * .nanosAsLong=true, set by Verify/Bench); normalize it back to a
    * microsecond TimestampType exactly like DuckDB's nanos read does
    * (truncation), so oracle comparisons agree.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }
}
