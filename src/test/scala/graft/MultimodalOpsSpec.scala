package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: typed mapPartitions over blob records") {
    val blobs = Seq(
      (1L, "image", "abcd"),
      (2L, "audio", ""))
      .toDF("media_id", "modality", "text")
      .withColumn("blob", $"text".cast("binary"))
      .drop("text")
    val out = MultimodalOps.extractFeatures(blobs)
      .collect().map(f => f.media_id -> f).toMap
    val f1 = out(1L)
    assert(f1.n_bytes === 4)
    assert(f1.first_byte === 'a'.toInt)
    assert(f1.last_byte === 'd'.toInt)
    assert(f1.checksum_mod === ('a' + 'b' + 'c' + 'd').toLong % 997)
    assert(f1.n_frames === 1)
    val f2 = out(2L)
    assert(f2.n_bytes === 0)
    assert(f2.first_byte === -1)
    assert(f2.last_byte === -1)
  }

  test("frameSample takes stride offsets") {
    val out = Seq("abcdefghij").toDF("text")
      .select(MultimodalOps.frameSample($"text", 4).as("s"))
      .as[String].head()
    assert(out === "aei") // positions 1, 5, 9
  }

  test("blobMeta: byte length, md5, head bytes") {
    val m = MultimodalOps.blobMeta(lit("hello").cast("binary"))
    val row = Seq(1).toDF("x")
      .select(m("n_bytes").as("n"), m("md5_hex").as("h"), m("head4").as("p"))
      .head()
    assert(row.getInt(0) === 5)
    assert(row.getString(1) === "5d41402abc4b2a76b9719d911017c592")
    assert(row.getString(2) === "hell")
  }
}
