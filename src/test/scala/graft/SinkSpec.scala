package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.operators.{BatchingRowSink, IncrementalRunner, ParquetDaySink,
  RowBatchWriter, Sink}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** In-memory collector standing in for an external DB writer. Static so
  * executor-side writes land somewhere the test can see (local mode
  * shares the JVM — the standard Structured-Streaming-test trick).
  */
object CollectorSink {
  val batches = new ConcurrentLinkedQueue[Seq[Row]]()
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { batches.clear(); opens.set(0); closes.set(0) }
  def writer(): RowBatchWriter = {
    opens.incrementAndGet()
    new RowBatchWriter {
      override def writeBatch(rows: Seq[Row]): Unit = batches.add(rows)
      override def close(): Unit = { closes.incrementAndGet(); () }
    }
  }
}

class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("level pipeline writes through the Sink seam (external-DB shape)") {
    CollectorSink.reset()
    val raw = (0 until 48).map { h =>
      (1, T(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00"),
        100L, 12.0, 1000.0, 1005.0, 20.0, 50.0, 0.0,
        20.0, 30.0, 21.0, 31.0, 0.1, 0.2, 0.3, 0)
    }.toDF("site_no", "time", "count", "battery", "pressure1", "pressure2",
      "external_temperature", "external_humidity", "rain",
      "internal_temperature", "internal_humidity", "tube_temperature",
      "tube_humidity", "vwc1", "vwc2", "vwc3", "flag")
    val stations = Seq(graft.operators.LevelPipeline.Station(
      1, 0.01, 1000.0, 100.0, 1.0, 1.0, 100.0, 1.0, 0.05, 0.05)).toDF()
    val silo = Seq((1, T("2024-01-01 08:00:00"), 10.0, 60.0))
      .toDF("site_no", "time", "average_temperature", "average_humidity")
    val intensity = (0 until 48).map(h =>
      (1, T(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00"), 130.0))
      .toDF("site_no", "time", "intensity")

    val sink = new BatchingRowSink(() => CollectorSink.writer(), batchSize = 7)
    IncrementalRunner.processLevelsIncremental(
      raw, stations, silo, intensity, sink,
      now = T("2024-01-03 00:00:00"), backprocessDays = 1, padSeconds = 6 * 3600)

    val rows = {
      var out = List.empty[Row]
      CollectorSink.batches.forEach(b => out = out ++ b)
      out
    }
    // same window as the parquet path: only day-2 rows, all delivered
    assert(rows.nonEmpty)
    assert(rows.forall(
      !_.getAs[java.sql.Timestamp]("time").before(T("2024-01-02 00:00:01"))))
    var maxBatch = 0
    CollectorSink.batches.forEach(b => maxBatch = math.max(maxBatch, b.size))
    assert(maxBatch <= 7)
    // every opened writer was closed; empty partitions opened none
    assert(CollectorSink.opens.get() === CollectorSink.closes.get())
    assert(CollectorSink.opens.get() > 0)
  }

  test("ParquetDaySink is the same seam: upsert keeps untouched partitions") {
    val d = java.nio.file.Files.createTempDirectory("graft_sink_").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/table"
    val sink: Sink = new ParquetDaySink(path)
    sink.upsert(Seq(
      (1, T("2024-01-01 10:00:00"), 1.0),
      (1, T("2024-01-02 10:00:00"), 2.0)).toDF("site_no", "time", "v"))
    sink.upsert(Seq(
      (1, T("2024-01-02 10:00:00"), 20.0)).toDF("site_no", "time", "v"))
    val out = IncrementalRunner.readLevel(spark, path)
      .select("site_no", "time", "v").as[(Int, java.sql.Timestamp, Double)]
      .collect().toSet
    assert(out === Set(
      (1, T("2024-01-01 10:00:00"), 1.0),
      (1, T("2024-01-02 10:00:00"), 20.0)))
  }

  test("Sink.foreachBatch adapts the seam to streaming micro-batches") {
    CollectorSink.reset()
    val sink = new BatchingRowSink(() => CollectorSink.writer(), batchSize = 10)
    val fn = Sink.foreachBatch(sink)
    fn(Seq((1, T("2024-01-01 10:00:00"), 1.0)).toDF("site_no", "time", "v"), 0L)
    var n = 0
    CollectorSink.batches.forEach(b => n += b.size)
    assert(n === 1)
  }
}
