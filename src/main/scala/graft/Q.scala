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

  /** Read one driver test table, normalizing the events table's `ts` to
    * a session-TZ TimestampType whatever physical form the generator
    * used — the driver has shipped it two ways across rounds:
    *   - TIMESTAMP(NANOS), which Spark only reads as raw nanos
    *     (spark.sql.legacy.parquet.nanosAsLong=true, set by Verify/
    *     Bench): truncate to micros exactly like DuckDB's nanos read;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers
    *     as TimestampNTZType: cast to TimestampType (sessions run UTC,
    *     so the wall-clock value — what DuckDB's naive read sees — is
    *     unchanged, and downstream unix_micros/window arithmetic that
    *     requires TIMESTAMP resolves).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
