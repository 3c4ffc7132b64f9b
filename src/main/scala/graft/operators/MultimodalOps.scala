package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque `binary` columns with typed metadata, and per-record decoding /
  * feature extraction runs as a typed `mapPartitions` over the blob
  * Dataset — the Spark-side shape (schema, partition-parallel batching,
  * encoder boundaries) is real; only the codec call itself is stubbed,
  * because no image/audio codec libraries ship in this environment.
  *
  * At scale: blobs never enter a shuffle — derived features (small fixed
  * schema) are computed partition-local and only those are joined back /
  * aggregated. Partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` on the blob store scan.
  */
object MultimodalOps {

  /** One media record: id + modality tag + payload + sidecar metadata. */
  final case class MediaRecord(
      media_id: Long,
      modality: String,
      blob: Array[Byte])

  /** Extracted features (fixed small schema — this is all that shuffles). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      first_byte: Int,
      last_byte: Int,
      checksum_mod: Long,
      n_frames: Int)

  /** REAL decode hook — intentionally unimplemented: wire an actual codec
    * (JPEG/PNG/audio frame decoder) here when the runtime provides one.
    * Everything around it (typed Dataset, partition batching, feature
    * schema) is production-shaped and tested via [[decodeStub]].
    */
  def decodeReal(blob: Array[Byte]): MediaFeatures = ???

  /** Deterministic stand-in for the codec: derives features from the raw
    * bytes only (length, boundary bytes, rolling checksum, fake frame
    * count), so tests and cross-engine oracles are exact.
    */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bs = rec.blob
    var sum = 0L
    var i = 0
    while (i < bs.length) { sum += (bs(i) & 0xff).toLong; i += 1 }
    MediaFeatures(
      media_id = rec.media_id,
      modality = rec.modality,
      n_bytes = bs.length,
      first_byte = if (bs.nonEmpty) bs(0) & 0xff else -1,
      last_byte = if (bs.nonEmpty) bs(bs.length - 1) & 0xff else -1,
      checksum_mod = sum % 997L,
      n_frames = bs.length / 64 + 1)
  }

  /** Partition-parallel feature extraction over a blob DataFrame with
    * columns (media_id, modality, blob). Typed mapPartitions: the encoder
    * feeds each executor thread an iterator of records, features come back
    * as a columnar-encodable Dataset — the same shape a vectorized Python
    * (mapInPandas) bridge would use.
    */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("media_id").cast("long"), col("modality").cast("string"),
        col("blob").cast("binary"))
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
  }

  /** Deterministic frame sampling: bytes at stride offsets re-assembled as
    * a small binary "thumbnail" — column-only (no lambda), engine-portable.
    */
  def frameSample(text: org.apache.spark.sql.Column, stride: Int)
      : org.apache.spark.sql.Column =
    array_join(
      transform(
        sequence(lit(1), length(text), lit(stride)),
        i => substr(text, i, lit(1))),
      "")

  /** Blob metadata projection (pure columns over the binary payload). */
  def blobMeta(blob: org.apache.spark.sql.Column): Map[String, org.apache.spark.sql.Column] =
    Map(
      "n_bytes" -> length(blob),
      "md5_hex" -> md5(blob),
      "head4" -> substr(blob, lit(1), lit(4)).cast("string"))
}
