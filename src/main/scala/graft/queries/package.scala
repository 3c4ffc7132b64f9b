package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object queries {

  /** Exact-arithmetic cast for money-like doubles (values carry <=2 dp, so
    * decimal(18,2) is lossless); keeps aggregate sums order-independent and
    * therefore bit-identical between Spark and the DuckDB oracle.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Canonical float output: exact value in, deterministically rounded
    * double out (same operands -> same IEEE result on both engines).
    */
  def rd(c: Column, n: Int = 6): Column = round(c.cast("double"), n)

  /** Shared scratch root for queries that materialize throwaway on-disk
    * artifacts (persisted indexes, JSONL round-trips): ONE temp root with
    * ONE JVM shutdown hook — a hook registered per invocation accumulates
    * across repeated harness runs in one JVM (ADVICE r9) — and a fresh
    * subdirectory per call so invocations never collide.
    */
  lazy val queryTmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_query_tmp_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
    }
    root
  }

  /** Fresh subdirectory under [[queryTmpRoot]]; `tag` names the query. */
  def freshTmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(queryTmpRoot, tag).toString

  /** Per-query opt-in input fan-out (optimization guide §2.5 "input
    * skew"): round-robin repartition to the default parallelism when the
    * frame currently has fewer partitions — used in front of brute-force
    * per-row-heavy passes (all-pairs cosine ground truths, projection
    * sweeps) whose single-file scan would otherwise run on one core.
    * Scale-adaptive: a corpus-scale scan already carries >= parallelism
    * partitions and is returned untouched, so no shuffle is ever added
    * at 100 TB. Deliberately opt-in per query: for cheap per-row work
    * the added exchange costs more than the parallelism buys.
    */
  def fan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
