package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** The pluggable write boundary: every pipeline output goes through a
  * `Sink`, so swapping day-partitioned parquet for an external store
  * (the reference writes to InfluxDB — `nmdb/influx_db.py:76-147` — and
  * MongoDB — `pipeline/csv_mongodb_converter.py:47-101`) is a
  * constructor argument, not a pipeline change.
  *
  * Semantics every implementation must honor: `upsert` is an IDEMPOTENT
  * windowed overwrite keyed by (site, day of tsCol) — re-running the
  * same recompute window twice leaves the same state (the reference's
  * point-overwrite + DROP SERIES behavior).
  */
trait Sink extends Serializable {
  def upsert(updated: DataFrame, tsCol: String = "time"): Unit
}

object Sink {
  /** Adapter for Structured Streaming: `writeStream.foreachBatch(
    * Sink.foreachBatch(sink))` pushes each micro-batch through the same
    * seam the batch pipeline uses. A micro-batch is a PARTIAL-window
    * frame, so pair this with a point-upsert sink
    * ([[ParquetPointUpsertSink]] or an upsert-by-key external writer) —
    * a partition-REPLACE sink would delete a day's earlier rows whenever
    * a later batch touches the same day. Restart/replay safety comes from
    * the upsert key: re-delivering a committed batch rewrites the same
    * keys (spec: StreamingOpsSpec "checkpointed restart").
    */
  def foreachBatch(sink: Sink, tsCol: String = "time"): (DataFrame, Long) => Unit =
    (batch, _) => sink.upsert(batch, tsCol)
}

/** Day-partitioned parquet with dynamic partition overwrite — the scale
  * default for FULL-window recomputes (every touched partition is fully
  * re-derived; see [[IncrementalRunner.upsertByDay]]).
  */
final class ParquetDaySink(path: String) extends Sink {
  override def upsert(updated: DataFrame, tsCol: String): Unit =
    IncrementalRunner.upsertByDay(updated, path, tsCol)
}

/** Day-partitioned parquet with POINT-overwrite semantics: stored rows in
  * touched partitions that don't collide on `keyCols` survive — for
  * partial-window appends (see [[IncrementalRunner.upsertByKey]]).
  */
final class ParquetPointUpsertSink(
    path: String, keyCols: Seq[String] = Nil) // default: (site_no, tsCol)
    extends Sink {
  override def upsert(updated: DataFrame, tsCol: String): Unit =
    IncrementalRunner.upsertByKey(updated, path, keyCols, tsCol)
}

/** One connection-scoped writer per partition (opened and closed on the
  * EXECUTOR — the factory closure must be serializable and must not
  * capture driver-only resources).
  */
trait RowBatchWriter extends AutoCloseable {
  def writeBatch(rows: Seq[Row]): Unit
}

/** External-DB-shaped sink: each partition opens one writer and streams
  * its rows in bounded batches — the shape of an Influx line-protocol or
  * Mongo bulk writer. Idempotency is the writer's contract (e.g. an
  * upsert-by-key bulk op); this class guarantees the delivery shape:
  * one connection per partition, batches of at most `batchSize`, close on
  * completion or failure, and bounded RETRY of a failed batch — the
  * reference's buffered writer sleeps 5 s and retries the write once on
  * a timeout (`pipeline/influx_cached_writer.py:30-36`, duplicated at
  * `nmdb/influx_db.py:16-59`); `maxRetries = 1` + `backoffMillis = 5000`
  * is that policy. A retried batch may have partially landed — this is
  * why idempotent (upsert-by-key) writers are the contract; retries
  * re-deliver, they never duplicate state. Retries exhausted -> the
  * failure propagates (Spark then retries/fails the task, same as the
  * reference's raise after its single retry).
  *
  * `sleep` is injectable for tests; the default really sleeps on the
  * EXECUTOR thread, which is the correct place for write backpressure
  * (never the driver).
  */
final class BatchingRowSink(
    open: () => RowBatchWriter,
    batchSize: Int = 1000,
    maxRetries: Int = 1,
    backoffMillis: Long = 5000L,
    sleep: Long => Unit = Thread.sleep) extends Sink {
  require(maxRetries >= 0, "maxRetries must be >= 0")
  override def upsert(updated: DataFrame, tsCol: String): Unit = {
    val openF = open
    val bs = batchSize
    val retries = maxRetries
    val backoff = backoffMillis
    val sleepF = sleep
    updated.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val w = openF()
        try it.grouped(bs).foreach { g =>
          val batch = g.toSeq
          var attempt = 0
          var done = false
          while (!done) {
            try { w.writeBatch(batch); done = true }
            catch {
              case e if scala.util.control.NonFatal(e) && attempt < retries =>
                attempt += 1
                sleepF(backoff)
            }
          }
        }
        finally w.close()
      }
    }
  }
}

/** Decorator adding ZERO-COST write metrics to any [[Sink]] via Spark's
  * `observe` API: row count, null-timestamp count, and the written
  * time span ride the write job's own pass as accumulator-backed
  * aggregates — no second scan, no extra action, works identically
  * under `foreachBatch`. The numbers a scheduled ingest publishes per
  * run ("how many points, which window, any null times") come from the
  * job that wrote them — a separate counting query can disagree with
  * what was actually written; an observation cannot.
  *
  * Contract on the wrapped sink (every implementation in this file
  * satisfies it): `upsert` must synchronously execute ONE FULL action
  * over the frame it is handed. A sink that never materializes the
  * frame would leave `obs.get` blocking the driver; one whose first
  * action is a short-circuit probe (`take(1)`-style) would complete the
  * observation from a partial scan and under-count. Wrap such sinks'
  * INNER write path instead.
  */
final class MeteredSink(inner: Sink) extends Sink {
  @volatile private var last: Option[Map[String, Any]] = None

  /** Metrics of the most recent upsert on THIS driver: rows, null_ts,
    * min_ts, max_ts. None before the first upsert.
    */
  def lastMetrics: Option[Map[String, Any]] = last

  override def upsert(updated: DataFrame, tsCol: String): Unit = {
    import org.apache.spark.sql.{functions => F}
    val obs = org.apache.spark.sql.Observation()
    val observed = updated.observe(obs,
      F.count(F.lit(1)).as("rows"),
      F.count_if(F.col(tsCol).isNull).as("null_ts"),
      F.min(F.col(tsCol)).as("min_ts"),
      F.max(F.col(tsCol)).as("max_ts"))
    inner.upsert(observed, tsCol)
    // upsert is synchronous and every Sink consumes the frame it is
    // handed (that is the trait's contract), so the observed action has
    // completed and get returns immediately
    last = Some(obs.get.toMap)
  }
}
