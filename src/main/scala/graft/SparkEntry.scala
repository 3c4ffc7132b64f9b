package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LoaderQueries, MultimodalQueries, PhysicsQueries,
  PipelineQueries, RelationalQueries, SimilarityQueries, TemporalQueries,
  TextQueries, ValidationQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by the per-family modules under `graft.queries`;
  * each entry pairs the Spark implementation with a DuckDB oracle over the
  * same parquet tables (or no oracle for non-SQL-expressible operators,
  * which the driver then checks rows-only).
  */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    TemporalQueries,
    PhysicsQueries,
    TextQueries,
    SimilarityQueries,
    MultimodalQueries,
    PipelineQueries,
    ValidationQueries,
    LoaderQueries)

  lazy val all: Map[String, Q] = modules.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql), _, _)) => n -> sql.trim }

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[String] =
    all.collect { case (n, q) if q.bench => n }.toSeq.sorted
}
