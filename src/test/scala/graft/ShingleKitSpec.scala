package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class ShingleKitSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "",
    "one",
    "one two",
    "one two three",
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",
    "émoji ✓ utf8 tokens here").toDF("text")

  test("native shingles3 equals the HOF fold formulation") {
    val out = docs.select(
      TextOps.hashedShingles3(TextOps.tokens($"text")).as("native"),
      TextOps.hashedShingles3Hof(TextOps.tokens($"text")).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (n, h) => assert(n === h) }
    // sanity: k=3 arity — n tokens yield max(0, n-2) shingles
    val sizes = docs.select(size(TextOps.tokens($"text")),
      size(TextOps.hashedShingles3(TextOps.tokens($"text"))))
      .as[(Int, Int)].collect()
    sizes.foreach { case (nt, ns) => assert(ns === math.max(0, nt - 2)) }
  }

  test("native minhash signature equals the HOF fold formulation") {
    val sh = TextOps.hashedShingles3(TextOps.tokens($"text"))
    val out = docs.select(
      TextOps.minhashSignature(sh, 8).as("native"),
      TextOps.minhashSignatureHof(TextOps.hashedShingles3Hof(
        TextOps.tokens($"text")), 8).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (n, h) => assert(n === h) }
    // shingle-less doc -> the P sentinel in every slot
    val empty = Seq("one two").toDF("text")
      .select(TextOps.minhashSignature(
        TextOps.hashedShingles3(TextOps.tokens($"text")), 4))
      .as[Seq[Long]].head()
    assert(empty === Seq.fill(4)(TextOps.MinhashPrime))
  }

  test("null token array yields null") {
    val df = Seq(Some("a b c d"), None).toDF("text")
    val out = df.select(
      TextOps.hashedShingles3(TextOps.tokens($"text")).as("sh"))
      .collect().map(_.isNullAt(0))
    assert(out === Array(false, true))
  }

  test("null ELEMENTS are skipped, not NPE'd (arbitrary SQL input)") {
    import graft.operators.TextOps
    // array with a null slot: shingles must equal the null-filtered array's
    val out = spark.sql(
      """SELECT graft_shingles3(array('a', CAST(NULL AS STRING), 'b', 'c', 'd')) AS s,
                graft_shingles3(array('a', 'b', 'c', 'd')) AS t""")
      .as[(Seq[Long], Seq[Long])].head()
    assert(out._1 === out._2)
    // minhash over an array<bigint> with a null slot: null slots ignored
    val sig = spark.sql(
      """SELECT graft_minhash_sig(array(CAST(7 AS BIGINT), CAST(NULL AS BIGINT)), 4) AS a,
                graft_minhash_sig(array(CAST(7 AS BIGINT)), 4) AS b""")
      .as[(Seq[Long], Seq[Long])].head()
    assert(sig._1 === sig._2)
  }

  test("registered as SQL functions via GraftExtensions") {
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(graft_shingles3(split('a b c d', ' ')), 4) AS s")
      .as[Seq[Long]].head()
    val viaApi = Seq("a b c d").toDF("text")
      .select(TextOps.minhashSignature(
        TextOps.hashedShingles3(TextOps.tokens($"text")), 4))
      .as[Seq[Long]].head()
    assert(viaSql === viaApi)
  }
}
