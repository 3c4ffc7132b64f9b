package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class Md5Hash64Spec extends SparkSpec {
  import spark.implicits._

  test("native hash equals the built-in conv(substring(md5)) formulation") {
    val df = Seq("", "a", "spark", "the quick brown fox", "émoji ✓ utf8")
      .toDF("s")
    val out = df.select(
      TextOps.baseHash60($"s").as("native"),
      conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("builtin"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, b) => assert(n === b) }
  }

  test("null input yields null, values fit in 60 bits") {
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(TextOps.baseHash60($"s")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(1) === None)
    assert(out(0).exists(v => v >= 0 && v < (1L << 60)))
  }

  test("native DotFold equals the HOF zip_with/aggregate formulation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.7f)))
      .toDF("a", "b")
    val out = df.select(
      graft.operators.SimilarityOps.dotFold($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b",
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n === h) }
  }

  test("registered as a SQL function via GraftExtensions") {
    // the shared test session installs graft.GraftExtensions
    val v = spark.sql("SELECT graft_md5hash64('spark') AS h").as[Long].head()
    val expected = Seq("spark").toDF("s")
      .select(TextOps.baseHash60($"s")).as[Long].head()
    assert(v === expected)
  }
}
