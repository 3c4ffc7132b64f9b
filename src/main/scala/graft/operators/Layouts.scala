package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout helpers for repeat-join workloads. Bucketing
  * pre-shuffles a table ONCE at write time: two tables bucketed the same
  * way on the join key co-locate, and every subsequent join between them
  * runs with NO exchange on either side — at 100 TB that converts the
  * recurring dominant cost (re-shuffling fact tables per query) into a
  * one-time layout cost. Use for the keys joined every run (site_no,
  * doc_id); leave ad-hoc dimensions to broadcast.
  */
object Layouts {

  /** Write `df` as a bucketed external table (data at `path`, metadata in
    * the session catalog). Bucket counts should match between co-joined
    * tables; sortBy keeps each bucket file sorted for merge-join reads.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      bucketCols: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
