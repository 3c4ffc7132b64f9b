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

  /** One decoded header row: the blob id plus [[MediaCodec.MediaInfo]]'s
    * facts (fixed small schema — this is all that shuffles).
    */
  final case class MediaHeader(
      media_id: Long,
      format: String,
      valid: Boolean,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  /** REAL decode: pure-JVM container-header parsing ([[MediaCodec]] —
    * PNG/JPEG/GIF/WAV dims, channels, sample rate, duration). Full
    * PIXEL decoding still needs a codec library this environment
    * doesn't ship (raw PCM audio needs none — [[pcmSampleStats]]
    * decodes it for real); header facts are what the curation
    * pipeline filters and routes on, and they parse from public byte
    * layouts alone. Never throws — corrupt or truncated blobs surface
    * as `valid = false` rows (MultimodalOpsSpec pins every prefix
    * truncation of every format).
    */
  def decodeReal(blob: Array[Byte]): MediaCodec.MediaInfo =
    MediaCodec.decode(blob)

  final case class PcmStats(
      media_id: Long,
      valid: Boolean,
      sample_rate: Option[Int],
      n_samples: Option[Int],
      min_s: Option[Int],
      max_s: Option[Int],
      sum_s: Option[Long],
      sumsq_s: Option[Long])

  /** REAL PCM sample statistics: 16-bit LE WAV payloads decode with
    * plain byte math (PCM is uncompressed — no codec needed), yielding
    * exact INTEGER aggregates per blob (n, min, max, Σs, Σs²). Float
    * derivations (mean, RMS, loudness) belong in the query layer where
    * both engines share the IEEE ops on these exact operands. Blobs
    * stay inside their partition — the output is metadata-sized, the
    * audio never shuffles. Non-WAV / non-16-bit / truncated payloads
    * surface as `valid = false` rows, never exceptions.
    */
  def pcmSampleStats(blobs: DataFrame): Dataset[PcmStats] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("media_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        MediaCodec.pcmStats(b) match {
          case Some((rate, n, mn, mx, sum, sumSq)) =>
            PcmStats(id, valid = true, Some(rate), Some(n), Some(mn),
              Some(mx), Some(sum), Some(sumSq))
          case None =>
            PcmStats(id, valid = false, None, None, None, None, None, None)
        }
      })
  }

  /** One fixed-size PCM frame's exact integer aggregates ([[pcmFrames]]).
    * `sumsq` stays integer so the RMS float derivation belongs to the
    * query layer (the pcmSampleStats discipline).
    */
  final case class PcmFrame(media_id: Long, frame_idx: Int, n_f: Int,
      peak: Int, sumsq: Long)

  /** Fixed-size framing over the decoded PCM stream — the windowed-DSP
    * feature-extraction primitive (VAD energy gates, loudness contours,
    * silence trimming all start from per-frame peak/energy). One typed
    * mapPartitions decodes each blob ONCE and emits its frames; a blob
    * that is not valid 16-bit PCM contributes no rows (the poison-blob
    * contract). The last frame may be partial; `n_f` carries its true
    * length so the query layer normalizes correctly.
    */
  def pcmFrames(blobs: DataFrame, frameSize: Int): Dataset[PcmFrame] = {
    require(frameSize > 0, s"pcmFrames: frameSize must be > 0, got $frameSize")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("media_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        MediaCodec.pcmSamples(b) match {
          case Some((_, s)) =>
            s.grouped(frameSize).zipWithIndex.map { case (fr, i) =>
              var peak = 0
              var sq = 0L
              fr.foreach { v =>
                val a = math.abs(v)
                if (a > peak) peak = a
                sq += v.toLong * v
              }
              PcmFrame(id, i, fr.length, peak, sq)
            }
          case None => Iterator.empty
        }
      })
  }

  final case class PcmDecim(media_id: Long, rate_out: Int, n_out: Int,
    sum_s: Long, sumsq: Long, peak: Int, first_s: Int, last_s: Int)

  /** STRIDE decimation over decoded PCM — keep every `factor`-th
    * sample (the audio twin of video frame-sampling: cut the rate
    * before an expensive downstream model; naive decimation, no
    * anti-alias filter — aliasing is the caller's tradeoff and the
    * honest description of what stride sampling does). Each blob
    * decodes ONCE in the typed mapPartitions (the codec is the
    * legitimate mapPartitions case) and reduces IN the same pass to
    * one row of integer-exact aggregates of the kept samples
    * (n/sum/sumsq/peak/first/last) — nothing sample-sized ever
    * shuffles, so 100 TB of audio costs one scan with per-blob
    * O(n/factor) arithmetic. Invalid blobs yield no row
    * ([[pcmFrames]]'s contract); `rate_out` = rate/factor truncated.
    */
  def pcmDecimate(blobs: DataFrame, factor: Int): Dataset[PcmDecim] = {
    require(factor >= 1, s"pcmDecimate: factor must be >= 1, got $factor")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("media_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        MediaCodec.pcmSamples(b) match {
          case Some((rate, s)) =>
            var i = 0; var n = 0; var sum = 0L; var sq = 0L
            var peak = 0; var first = 0; var last = 0
            while (i < s.length) {
              val v = s(i)
              if (n == 0) first = v
              last = v; n += 1; sum += v; sq += v.toLong * v
              val a = math.abs(v); if (a > peak) peak = a
              i += factor
            }
            Iterator.single(
              PcmDecim(id, rate / factor, n, sum, sq, peak, first, last))
          case None => Iterator.empty
        }
      })
  }

  /** Energy-gate segmentation over the framed PCM stream — the VAD
    * (voice-activity-detection) shape every speech-data pipeline runs
    * before transcription/frame-sampling: a frame is ACTIVE when its
    * energy clears the gate (`sumsq > sumsqThreshold`, an all-integer
    * compare so both engines agree exactly), and consecutive active
    * frames merge into segments by the islands rule (a gap of ≥ 1
    * inactive frame splits). Builds on [[pcmFrames]] — the blob still
    * decodes exactly once — and everything after the decode is
    * relational: a filter, one doc-keyed window pass, a rollup. Per
    * segment: frame span, sample count, peak, and RMS over the
    * segment's samples (the one derived float, rounded).
    *
    * Scale shape: frames fan out map-side from the decode; the only
    * exchange is keyed by media_id (bounded per blob), and the
    * segment window never sees inactive frames — silence is filtered
    * before the shuffle, which for sparse audio (most of a crawl) is
    * the dominant data cut.
    */
  def energySegments(
      blobs: DataFrame,
      frameSize: Int,
      sumsqThreshold: Long): DataFrame = {
    require(sumsqThreshold >= 0,
      s"energySegments: threshold must be >= 0, got $sumsqThreshold")
    import org.apache.spark.sql.expressions.Window
    val act = pcmFrames(blobs, frameSize).toDF()
      .filter(col("sumsq") > sumsqThreshold)
    val wPrev = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val segs = act
      .withColumn("__brk",
        when(col("frame_idx") >
          coalesce(max(col("frame_idx")).over(wPrev), lit(-2)) + 1,
          1).otherwise(0))
      .withColumn("__g", sum(col("__brk")).over(wCum))
      .groupBy(col("media_id"), col("__g"))
      .agg(
        min(col("frame_idx")).as("seg_start"),
        max(col("frame_idx")).as("seg_end"),
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("n_f")).cast("long").as("n_samples"),
        max(col("peak")).as("seg_peak"),
        sum(col("sumsq")).as("__sumsq"))
    segs
      .withColumn("seg_idx",
        row_number().over(
          Window.partitionBy(col("media_id")).orderBy(col("seg_start"))))
      .select(col("media_id"), col("seg_idx"), col("seg_start"),
        col("seg_end"), col("n_frames"), col("n_samples"), col("seg_peak"),
        round(sqrt(col("__sumsq").cast("double") / col("n_samples")), 6)
          .as("seg_rms"))
  }

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

  /** Partition-parallel REAL header decoding over (media_id, blob) rows:
    * the same typed-mapPartitions shape as [[extractFeatures]], with
    * [[decodeReal]] as the per-record codec — blobs stay partition-local,
    * only the fixed-schema header rows come back.
    */
  def decodeHeaders(blobs: DataFrame): Dataset[MediaHeader] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("media_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val m = decodeReal(b)
        MediaHeader(id, m.format, m.valid, m.width, m.height, m.channels,
          m.sample_rate, m.duration_ms)
      })
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

  /** Fixed-size byte patching — the model-input assembly step for
    * binary payloads (a ViT-style patch grid flattened to 1-D, an audio
    * chunker): blob id → ⌈n/patchBytes⌉ rows of (patch_no, patch bytes,
    * its length and md5), last patch ragged. Patch extraction is IN-ROW
    * (sequence + substr over the binary — codegen, no lambda); only the
    * explode multiplies rows, and the blob itself still never shuffles
    * when the caller keeps downstream ops partition-local (the
    * [[extractFeatures]] contract). [[TextOps.slidingChunks]]'s binary
    * sibling — fixed geometry, byte units, no overlap.
    *
    * @return (idCol, patch_no, n_bytes, md5_hex) — patch bytes are
    *         hashed, not carried, so the output is metadata-sized
    */
  def patchify(
      blobs: DataFrame,
      idCol: String,
      blobCol: String,
      patchBytes: Int): DataFrame = {
    require(patchBytes >= 1,
      s"patchify: patchBytes must be >= 1 (got $patchBytes)")
    val reserved = Seq("patch_no", "n_bytes", "md5_hex", "__patch")
      .filter(blobs.columns.contains)
    require(reserved.isEmpty,
      s"patchify reserves column(s) ${reserved.mkString(", ")} — rename " +
        "them on the input")
    val b = col(blobCol)
    blobs
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(length(b), lit(1)), lit(patchBytes)),
          off => substr(b, off, lit(patchBytes)))))
      .select(col(idCol), col("pos").cast("int").as("patch_no"),
        length(col("col")).as("n_bytes"),
        md5(col("col")).as("md5_hex"))
  }
}
