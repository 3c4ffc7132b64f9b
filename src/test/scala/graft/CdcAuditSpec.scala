package graft

import graft.operators.{TextOps, TimeSeriesOps}
import org.apache.spark.sql.functions._

class CdcAuditSpec extends SparkSpec {
  import spark.implicits._

  private def T(s: String) = java.sql.Timestamp.valueOf(s)

  test("cdcChunks: edit stability — a prefix insertion only reshifts " +
    "the chunks it touches") {
    val doc = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(600).mkString
    val df = Seq(("orig", doc), ("edited", "XYZQW " + doc)).toDF("tag", "text")
    val (_, md5s) = TextOps.cdcChunks(col("text"))
    val out = df.select($"tag", md5s.as("m"))
      .as[(String, Seq[String])].collect().toMap
    val shared = out("orig").toSet & out("edited").toSet
    assert(out("orig").size >= 8)
    // all but the first chunk(s) survive the edit
    assert(shared.size >= out("orig").size - 2,
      s"only ${shared.size} of ${out("orig").size} chunks survived")
  }

  test("cdcChunks: native boundary scan equals the HOF fold formulation") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      "",
      "short",
      "exactly8",
      "the quick brown fox jumps over the lazy dog " * 20,
      "émoji ✓ unicode ±¶ text with 🚀 non-bmp chars repeated " * 10,
      ("a" * 63) + "b" + ("c" * 200))
      .toDF("text")
    val (nf, nm) = TextOps.cdcChunks(col("text"))
    val (hf, hm) = TextOps.cdcChunksHof(col("text"))
    val rows = docs.select(nf.as("nf"), hf.as("hf"), nm.as("nm"), hm.as("hm"))
      .as[(Seq[Int], Seq[Int], Seq[String], Seq[String])].collect()
    rows.foreach { case (a, b, c, d) => assert(a === b); assert(c === d) }
  }

  test("cdcChunks: short doc (< window) is one whole-text chunk") {
    val (frame, md5s) = TextOps.cdcChunks(col("text"))
    val row = Seq("tiny").toDF("text")
      .select(frame.as("f"), md5s.as("m"))
      .as[(Seq[Int], Seq[String])].head()
    assert(row._1 === Seq(0, 4))
    assert(row._2.size === 1)
  }

  test("connectedComponents: local union-find and distributed loop agree") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val local = graft.operators.DedupOps.connectedComponents(edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val distributed = graft.operators.DedupOps
      .connectedComponents(edges, maxLocalEdges = 0L)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(local === distributed)
    assert(local === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("nearDupAudit: dynamic pressure selection and 5-field threshold") {
    def row(t: String, battery: Double, count: Long, tube: Double,
        rain: Double, p1: Double, p2: Double) =
      (1, T(t), battery, count, tube, rain, p1, p2)
    val df = Seq(
      row("2024-01-01 10:00:00", 12.0, 100L, 21.0, 0.0, 5.0, 1000.0),
      // all five match (p1 dead <10 on the CURRENT row -> pressure2 used)
      row("2024-01-01 10:10:00", 12.0, 100L, 21.0, 0.0, 5.0, 1000.0),
      // four match, pressure2 differs -> below threshold, not flagged
      row("2024-01-01 10:20:00", 12.0, 100L, 21.0, 0.0, 5.0, 999.0),
      // outside the 29-min window of the only identical row -> not flagged
      row("2024-01-01 11:00:00", 12.0, 100L, 21.0, 0.0, 5.0, 999.0))
      .toDF("site_no", "time", "battery", "count", "tube_temperature",
        "rain", "pressure1", "pressure2")
    val out = TimeSeriesOps.nearDupAudit(
      df, Seq("site_no"), "time", 29 * 60,
      Seq("battery", "count", "tube_temperature", "rain"))
      .select("time", "n_dups").as[(java.sql.Timestamp, Long)]
      .collect().toMap
    assert(out === Map(T("2024-01-01 10:10:00") -> 1L))
  }

  test("nearDupAuditReport emits the review-file lines in order") {
    def row(t: String, battery: Double, count: Long, tube: Double,
        rain: Double, p1: Double, p2: Double) =
      (1, T(t), battery, count, tube, rain, p1, p2)
    val df = Seq(
      row("2024-01-01 10:00:00", 12.0, 100L, 21.0, 0.0, 5.0, 1000.0),
      row("2024-01-01 10:00:30", 12.0, 100L, 21.0, 0.0, 5.0, 1000.0),
      row("2024-01-01 10:10:00", 12.0, 100L, 21.0, 0.0, 5.0, 1000.0))
      .toDF("site_no", "time", "battery", "count", "tube_temperature",
        "rain", "pressure1", "pressure2")
    val lines = TimeSeriesOps.nearDupAuditReport(
      df, Seq("site_no"), "time", 29 * 60,
      Seq("battery", "count", "tube_temperature", "rain"))
      .orderBy(col("at_time").asc_nulls_first, col("pos"))
      .select("line").as[String].collect().toSeq
    assert(lines.head ===
      "Results of search for duplicates at station number 1")
    // 10:00:30 duplicates 1 prior (30s before); 10:10 duplicates 2 priors
    assert(lines.exists(_.contains(
      "Time 2024-01-01 10:00:30 is potentially a duplicate of 1 previous records:")))
    assert(lines.exists(_.contains("Record at 30.0 seconds before:")))
    assert(lines.exists(_.contains(
      "Time 2024-01-01 10:10:00 is potentially a duplicate of 2 previous records:")))
    assert(lines.exists(_.contains("Record at 10.0 minutes before:")))
    assert(lines.exists(_.contains("This record: ")))
    // per-prior record lines carry the timestamp and the JSON record
    assert(lines.exists(l => l.contains("2024-01-01 10:00:00 - ") &&
      l.contains("\"battery\":12.0")))
    // the write path lays the lines down as a per-site text file
    val d = tempDirFile("graft_audit_")
    d.deleteOnExit()
    val path = d.getAbsolutePath + "/report"
    TimeSeriesOps.writeAuditReport(
      TimeSeriesOps.nearDupAuditReport(df, Seq("site_no"), "time", 29 * 60,
        Seq("battery", "count", "tube_temperature", "rain")),
      Seq("site_no"), path)
    val written = spark.read.text(s"$path/site_no=1").as[String].collect()
    assert(written.head === "Results of search for duplicates at station number 1")
  }
}
