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
}
