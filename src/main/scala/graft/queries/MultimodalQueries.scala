package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: documents' text bytes stand in for media
  * payloads (this environment ships no codecs), exercising the real
  * Spark-side plumbing — binary columns, metadata projection, deterministic
  * frame sampling, and typed mapPartitions feature extraction. Oracles
  * recompute the same values from the text on the SQL side (the payloads
  * are ASCII, so byte arithmetic == codepoint arithmetic).
  */
object MultimodalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val queries: Map[String, Q] = Map(
    // M1 — blob metadata + frame sampling as pure columns over a binary
    // payload: byte length, content md5, head bytes, stride-16 sample.
    "m1_blob_meta" -> Q(
      fn = (s, dir) => {
        val blob = col("text").cast("binary")
        val m = MultimodalOps.blobMeta(blob)
        t(s, dir, "documents")
          .select(col("doc_id").as("media_id"),
            m("n_bytes").as("n_bytes"),
            m("md5_hex").as("md5_hex"),
            m("head4").as("head4"),
            MultimodalOps.frameSample(col("text"), 16).as("frame_sample"))
          .orderBy(col("media_id"))
      },
      oracle = Some("""
        SELECT doc_id AS media_id,
               CAST(length(text) AS INT) AS n_bytes,
               md5(text) AS md5_hex,
               substr(text, 1, 4) AS head4,
               array_to_string(list_transform(
                 generate_series(1, length(text), 16),
                 i -> substr(text, CAST(i AS INT), 1)), '') AS frame_sample
        FROM documents
        ORDER BY media_id""")),

    // M4 — fixed-size byte patching of the blob column (the ViT-style
    // model-input assembly step, slidingChunks' binary sibling): each
    // payload becomes ceil(n/64) patch rows carrying length + md5, last
    // patch ragged. Patch extraction is in-row (sequence + substr,
    // codegen); patch BYTES are hashed, never carried, so the output —
    // and everything downstream — is metadata-sized. The oracle
    // recomputes every patch hash from character offsets (the corpus is
    // ASCII, so byte and char slicing agree).
    "m4_patchify" -> Q(
      fn = (s, dir) =>
        MultimodalOps.patchify(
          t(s, dir, "documents")
            .select(col("doc_id").as("media_id"),
              col("text").cast("binary").as("blob")),
          "media_id", "blob", patchBytes = 64)
          .orderBy(col("media_id"), col("patch_no")),
      oracle = Some("""
        SELECT doc_id AS media_id,
               CAST(j - 1 AS INT) AS patch_no,
               CAST(length(substr(text, CAST((j-1)*64 + 1 AS INT), 64))
                 AS INT) AS n_bytes,
               md5(substr(text, CAST((j-1)*64 + 1 AS INT), 64)) AS md5_hex
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1,
               CAST(ceil(greatest(length(text), 1) / 64.0) AS BIGINT)))
               AS j)
        ORDER BY media_id, patch_no""")),

    // M9 — CROSS-MEDIA patch dedup: patches (m4's 64-byte grid) whose
    // hash recurs in >= 2 DISTINCT payloads mark their bytes shared —
    // the binary-domain analogue of d17's boilerplate detector, which
    // is how repeated watermarks/logos/headers surface in an image or
    // audio corpus without decoding anything. Per payload: patch
    // count, shared-patch count, shared fraction. Patch BYTES never
    // shuffle (m4 hashes in-row); the corpus-scale exchange carries
    // 32-hex hashes, and the distinct-media count is a partial-agged
    // groupBy on those hashes. One division per row at the end.
    // M10 — PERCEPTUAL dHASH + near-dup hamming histogram: each blob's
    // first 72 bytes read as a 9×8 grayscale patch (the deterministic
    // stand-in for a decoded thumbnail); dHash bit j = pixel[r][c] >
    // pixel[r][c+1] over the 8 column pairs of each of 8 rows — the
    // gradient fingerprint image dedup uses (robust to brightness
    // shifts, unlike m9's exact patch md5). The 64 bits pack into TWO
    // 32-bit BIGINT words (bit 63 would overflow a signed pow-of-two
    // assembly on both engines — the t41 word-split); id-adjacent
    // pairs then histogram by hamming = Σ bit_count(xor). All in-row
    // codegen arithmetic: the corpus-wide exchange carries two longs
    // per blob, never pixels.
    "m10_dhash_neardup" -> Q(
      fn = (s, dir) => {
        def px(p: Int) = ascii(substring(col("text"), p, 1))
        def word(w: Int) = (0 until 32).map { jj =>
          val j = w * 32 + jj
          val r = j / 8
          val c = j % 8
          when(px(r * 9 + c + 1) > px(r * 9 + c + 2),
            lit(1L << jj)).otherwise(lit(0L))
        }.reduce(_ + _)
        val hashes = t(s, dir, "documents")
          .filter(length(col("text")) >= 72)
          .select(col("doc_id"), word(0).as("w0"), word(1).as("w1"))
        val pairs = hashes
          .select(col("doc_id").as("a"), col("w0").as("w0a"),
            col("w1").as("w1a"),
            explode(sequence(lit(1), lit(2))).as("d"))
          .select(col("a"), (col("a") + col("d")).as("b"),
            col("w0a"), col("w1a"))
          .join(hashes.select(col("doc_id").as("b"), col("w0").as("w0b"),
            col("w1").as("w1b")), "b")
        val ham = pairs.select(
          (bit_count(col("w0a").bitwiseXOR(col("w0b"))) +
            bit_count(col("w1a").bitwiseXOR(col("w1b"))))
            .cast("int").as("hamming"))
        val tot = ham.agg(count(lit(1)).as("n_total"))
        ham.groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(tot))
          .select(col("hamming"), col("n_pairs"),
            round(col("n_pairs").cast("double") /
              col("n_total").cast("double"), 6).as("share"))
          .orderBy(col("hamming"))
      },
      bench = true,
      oracle = Some("""
        WITH h AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(generate_series(0, 31),
                   j -> CASE WHEN
                     ord(substr(text, CAST((j // 8) * 9 + (j % 8) + 1
                       AS INT), 1)) >
                     ord(substr(text, CAST((j // 8) * 9 + (j % 8) + 2
                       AS INT), 1))
                     THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS w0,
                 CAST(list_sum(list_transform(generate_series(32, 63),
                   j -> CASE WHEN
                     ord(substr(text, CAST((j // 8) * 9 + (j % 8) + 1
                       AS INT), 1)) >
                     ord(substr(text, CAST((j // 8) * 9 + (j % 8) + 2
                       AS INT), 1))
                     THEN CAST(pow(2.0, j - 32) AS BIGINT) ELSE 0 END))
                   AS BIGINT) AS w1
          FROM documents WHERE length(text) >= 72),
        pairs AS (
          SELECT a.w0 AS w0a, a.w1 AS w1a, b.w0 AS w0b, b.w1 AS w1b
          FROM h a
          JOIN LATERAL (SELECT unnest(generate_series(1, 2)) AS d) d
            ON true
          JOIN h b ON b.doc_id = a.doc_id + d.d),
        ham AS (
          SELECT CAST(bit_count(xor(w0a, w0b))
                    + bit_count(xor(w1a, w1b)) AS INT) AS hamming
          FROM pairs),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ham)
        SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(count(*) AS DOUBLE)
                 / CAST(max(n_total) AS DOUBLE), 6) AS share
        FROM ham CROSS JOIN tot
        GROUP BY hamming
        ORDER BY hamming""")),

    "m9_patch_dedup" -> Q(
      fn = (s, dir) => {
        val patches = MultimodalOps.patchify(
          t(s, dir, "documents")
            .select(col("doc_id").as("media_id"),
              col("text").cast("binary").as("blob")),
          "media_id", "blob", patchBytes = 64)
        val shared = patches.groupBy(col("md5_hex"))
          .agg(countDistinct(col("media_id")).as("__nm"))
          .filter(col("__nm") >= 2)
          .select(col("md5_hex"))
        val tot = patches.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_patches"))
        val dup = patches.join(shared, "md5_hex")
          .groupBy(col("media_id")).agg(count(lit(1)).as("__nd"))
        tot.join(dup, Seq("media_id"), "left")
          .select(col("media_id"), col("n_patches"),
            coalesce(col("__nd"), lit(0L)).as("n_dup"),
            round(coalesce(col("__nd"), lit(0L)).cast("double") /
              col("n_patches").cast("double"), 6).as("dup_frac"))
          .orderBy(col("media_id"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id AS media_id,
                 md5(substr(text, CAST((j-1)*64 + 1 AS INT), 64)) AS h
          FROM documents,
               LATERAL (SELECT unnest(generate_series(1,
                 CAST(ceil(greatest(length(text), 1) / 64.0) AS BIGINT)))
                 AS j)),
        sh AS (
          SELECT h FROM p GROUP BY h
          HAVING count(DISTINCT media_id) >= 2),
        tot AS (
          SELECT media_id, CAST(count(*) AS BIGINT) AS n_patches
          FROM p GROUP BY 1),
        d AS (
          SELECT p.media_id, CAST(count(*) AS BIGINT) AS n_dup
          FROM p JOIN sh USING (h) GROUP BY 1)
        SELECT t.media_id, t.n_patches,
               coalesce(d.n_dup, 0) AS n_dup,
               round(CAST(coalesce(d.n_dup, 0) AS DOUBLE)
                 / CAST(t.n_patches AS DOUBLE), 6) AS dup_frac
        FROM tot t LEFT JOIN d USING (media_id)
        ORDER BY media_id""")),

    // M2 — typed mapPartitions decode stub: blobs -> fixed feature schema,
    // partition-local (no blob ever shuffles). The oracle recomputes the
    // stub's features from codepoints.
    "m2_decode_features" -> Q(
      fn = (s, dir) => {
        val blobs = t(s, dir, "documents").select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio"))
            .as("modality"),
          col("text").cast("binary").as("blob"))
        MultimodalOps.extractFeatures(blobs)
          .toDF()
          .orderBy(col("media_id"))
      },
      oracle = Some("""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
               CAST(length(text) AS INT) AS n_bytes,
               ord(substr(text, 1, 1)) AS first_byte,
               ord(substr(text, CAST(length(text) AS INT), 1)) AS last_byte,
               CAST(list_sum(list_transform(generate_series(1, length(text)),
                 i -> ord(substr(text, CAST(i AS INT), 1)))) % 997 AS BIGINT)
                 AS checksum_mod,
               CAST(floor(length(text) / 64) + 1 AS INT) AS n_frames
        FROM documents
        ORDER BY media_id""")),

    // M3 — REAL container-header decoding: each doc id synthesizes a
    // spec-conformant PNG/JPEG/GIF/WAV/WEBP whose geometry is pure arithmetic
    // in the id (MediaCodec.buildFixture), and the typed mapPartitions
    // pass parses the actual bytes back (magic sniff, marker walk, chunk
    // walk). The oracle recomputes the expected parse arithmetically —
    // a hash match proves the parser inverts the builder on every row,
    // i.e. the byte-level header layouts really round-trip. Corrupt /
    // truncated inputs are spec territory (MultimodalOpsSpec).
    "m3_decode_real" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val blobs = t(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.operators.MediaCodec.buildFixture(id))))
          .toDF("media_id", "blob")
        MultimodalOps.decodeHeaders(blobs)
          .toDF()
          .orderBy(col("media_id"))
      },
      oracle = Some("""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 5 AS INT)
                 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                 WHEN 2 THEN 'gif' WHEN 3 THEN 'wav'
                 ELSE 'webp' END AS format,
               TRUE AS valid,
               CASE WHEN doc_id % 5 <> 3
                 THEN CAST(doc_id % 199 + 1 AS INT) END AS width,
               CASE WHEN doc_id % 5 <> 3
                 THEN CAST(doc_id % 97 + 1 AS INT) END AS height,
               CASE CAST(doc_id % 5 AS INT)
                 WHEN 0 THEN 4 WHEN 1 THEN 3
                 WHEN 3 THEN CAST(doc_id % 2 + 1 AS INT)
                 WHEN 4 THEN CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END
                 END AS channels,
               CASE WHEN doc_id % 5 = 3
                 THEN CAST(8000 + (doc_id % 7) * 2000 AS INT)
                 END AS sample_rate,
               CASE WHEN doc_id % 5 = 3
                 THEN CAST(((doc_id % 50 + 1) * 1024 * 1000)
                   // ((8000 + (doc_id % 7) * 2000) * (doc_id % 2 + 1) * 2)
                   AS BIGINT) END AS duration_ms
        FROM documents
        ORDER BY media_id""")),

    // M5 — REAL PCM sample decoding: each doc id synthesizes a 16-bit
    // mono WAV whose SAMPLES are pure arithmetic in the id
    // (MediaCodec.buildWavTone: s_k = (id·31 + k·17) mod 2003 − 1001),
    // and the typed pass decodes the actual bytes back into exact
    // integer aggregates — the loudness/clipping/silence profile an
    // audio-curation gate filters on. Raw PCM needs no codec, so unlike
    // the stubbed pixel path this decode is fully real. The oracle
    // regenerates every sample arithmetically: a hash match proves the
    // byte-level sample layout round-trips on every row. Float mean/RMS
    // derive in the query layer from the exact integer sums (same IEEE
    // ops both engines); blobs never shuffle — output is metadata-sized.
    // M6 — fixed 64-sample PCM framing with per-frame peak and RMS: the
    // windowed-DSP primitive under VAD energy gates, loudness contours,
    // and silence trimming. Each blob decodes ONCE and emits its frames
    // from one typed mapPartitions; integer peak/sumsq cross the
    // engine boundary, the RMS float is derived in the query (the m5
    // discipline). The tone fixture's n is a multiple of 128, so every
    // frame is full — the operator still carries n_f for the general
    // partial-tail case (MultimodalOpsSpec covers it).
    "m6_pcm_frames" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val blobs = t(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.operators.MediaCodec.buildWavTone(id))))
          .toDF("media_id", "blob")
        MultimodalOps.pcmFrames(blobs, frameSize = 64).toDF()
          .select(col("media_id"), col("frame_idx"), col("n_f"),
            col("peak"),
            round(sqrt(col("sumsq").cast("double") / col("n_f")), 6)
              .as("rms"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      bench = true,
      oracle = Some("""
        WITH p AS (
          SELECT doc_id AS media_id,
                 CAST((doc_id % 20 + 1) * 128 AS INT) AS n_samples,
                 list_transform(
                   generate_series(0, CAST((doc_id % 20 + 1) * 128 - 1
                     AS BIGINT)),
                   k -> (doc_id * 31 + k * 17) % 2003 - 1001) AS s
          FROM documents),
        f AS (
          SELECT media_id,
                 CAST(fi AS INT) AS frame_idx,
                 s[CAST(fi * 64 + 1 AS INT):CAST((fi + 1) * 64 AS INT)]
                   AS fs
          FROM (SELECT media_id, s,
                       unnest(generate_series(0,
                         CAST(n_samples / 64 - 1 AS BIGINT))) AS fi
                FROM p))
        SELECT media_id, frame_idx, CAST(64 AS INT) AS n_f,
               CAST(list_max(list_transform(fs, v -> abs(v))) AS INT)
                 AS peak,
               round(sqrt(CAST(list_sum(list_transform(fs, v -> v * v))
                 AS DOUBLE) / 64), 6) AS rms
        FROM f
        ORDER BY media_id, frame_idx""")),

    // M7 — energy-gate (VAD) segmentation: m6's frames filtered by an
    // ALL-INTEGER energy gate (sumsq > 21.4M ≈ the tone's median frame
    // energy, so roughly half the frames are active), consecutive
    // active frames merged into segments by the islands rule, one RMS
    // float derived per segment at the end. The oracle re-derives the
    // tone, frames it, and restates the same gate + islands window —
    // the whole decode→frame→gate→segment audio front-end under one
    // hash check.
    "m7_vad_segments" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val blobs = t(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.operators.MediaCodec.buildWavTone(id))))
          .toDF("media_id", "blob")
        MultimodalOps.energySegments(blobs, frameSize = 64,
          sumsqThreshold = 21400000L)
          .orderBy(col("media_id"), col("seg_idx"))
      },
      bench = true,
      oracle = Some("""
        WITH p AS (
          SELECT doc_id AS media_id,
                 CAST((doc_id % 20 + 1) * 128 AS INT) AS n_samples,
                 list_transform(
                   generate_series(0, CAST((doc_id % 20 + 1) * 128 - 1
                     AS BIGINT)),
                   k -> (doc_id * 31 + k * 17) % 2003 - 1001) AS s
          FROM documents),
        f AS (
          SELECT media_id,
                 CAST(fi AS INT) AS frame_idx,
                 s[CAST(fi * 64 + 1 AS INT):CAST((fi + 1) * 64 AS INT)]
                   AS fs
          FROM (SELECT media_id, s,
                       unnest(generate_series(0,
                         CAST(n_samples / 64 - 1 AS BIGINT))) AS fi
                FROM p)),
        e AS (
          SELECT media_id, frame_idx,
                 CAST(list_max(list_transform(fs, v -> abs(v))) AS INT)
                   AS peak,
                 CAST(list_sum(list_transform(fs, v -> v * v)) AS BIGINT)
                   AS sumsq
          FROM f),
        act AS (SELECT * FROM e WHERE sumsq > 21400000),
        isl AS (
          SELECT media_id, frame_idx, peak, sumsq,
                 CASE WHEN frame_idx > coalesce(max(frame_idx) OVER (
                        PARTITION BY media_id ORDER BY frame_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -2) + 1
                      THEN 1 ELSE 0 END AS brk
          FROM act),
        grp AS (
          SELECT media_id, frame_idx, peak, sumsq,
                 sum(brk) OVER (PARTITION BY media_id
                   ORDER BY frame_idx) AS g
          FROM isl),
        segs AS (
          SELECT media_id, g,
                 CAST(min(frame_idx) AS INT) AS seg_start,
                 CAST(max(frame_idx) AS INT) AS seg_end,
                 CAST(count(*) AS INT) AS n_frames,
                 CAST(count(*) * 64 AS BIGINT) AS n_samples,
                 CAST(max(peak) AS INT) AS seg_peak,
                 CAST(sum(sumsq) AS BIGINT) AS ssq
          FROM grp GROUP BY 1, 2)
        SELECT media_id,
               CAST(row_number() OVER (PARTITION BY media_id
                 ORDER BY seg_start) AS INT) AS seg_idx,
               seg_start, seg_end, n_frames, n_samples, seg_peak,
               round(sqrt(CAST(ssq AS DOUBLE) / n_samples), 6) AS seg_rms
        FROM segs
        ORDER BY media_id, seg_idx""")),

    "m5_pcm_stats" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val blobs = t(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.operators.MediaCodec.buildWavTone(id))))
          .toDF("media_id", "blob")
        MultimodalOps.pcmSampleStats(blobs).toDF()
          .select(col("media_id"), col("sample_rate"), col("n_samples"),
            col("min_s"), col("max_s"),
            round(col("sum_s").cast("double") / col("n_samples"), 6)
              .as("mean_s"),
            round(sqrt(col("sumsq_s").cast("double") / col("n_samples")), 6)
              .as("rms"),
            round(col("n_samples").cast("double") / col("sample_rate"), 6)
              .as("duration_s"))
          .orderBy(col("media_id"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id AS media_id,
                 CAST(8000 + (doc_id % 7) * 2000 AS INT) AS sample_rate,
                 CAST((doc_id % 20 + 1) * 128 AS INT) AS n_samples,
                 list_transform(
                   generate_series(0, CAST((doc_id % 20 + 1) * 128 - 1
                     AS BIGINT)),
                   k -> (doc_id * 31 + k * 17) % 2003 - 1001) AS s
          FROM documents)
        SELECT media_id, sample_rate, n_samples,
               CAST(list_min(s) AS INT) AS min_s,
               CAST(list_max(s) AS INT) AS max_s,
               round(CAST(list_sum(s) AS DOUBLE) / n_samples, 6) AS mean_s,
               round(sqrt(CAST(list_sum(list_transform(s, v -> v * v))
                 AS DOUBLE) / n_samples), 6) AS rms,
               round(CAST(n_samples AS DOUBLE) / sample_rate, 6)
                 AS duration_s
        FROM p
        ORDER BY media_id""")),

    // M8 — stride decimation (keep every 4th sample): the audio twin
    // of video frame-sampling — cut the rate ahead of an expensive
    // downstream model. Each blob decodes once and reduces IN the
    // decode pass to integer-exact aggregates of the kept samples;
    // nothing sample-sized shuffles. The oracle re-derives the tone
    // (m5/m7's construction), strides it with a list comprehension,
    // and restates every aggregate in exact integer arithmetic.
    "m8_pcm_decimate" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val blobs = t(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            (id, graft.operators.MediaCodec.buildWavTone(id))))
          .toDF("media_id", "blob")
        MultimodalOps.pcmDecimate(blobs, factor = 4).toDF()
          .orderBy(col("media_id"))
      },
      bench = true,
      oracle = Some("""
        WITH p AS (
          SELECT doc_id AS media_id,
                 CAST((doc_id % 20 + 1) * 128 AS INT) AS n_samples,
                 CAST(8000 + (doc_id % 7) * 2000 AS INT) AS rate,
                 list_transform(
                   generate_series(0, CAST((doc_id % 20 + 1) * 128 - 1
                     AS BIGINT)),
                   k -> (doc_id * 31 + k * 17) % 2003 - 1001) AS s
          FROM documents),
        d AS (
          SELECT media_id, CAST(rate // 4 AS INT) AS rate_out,
                 list_transform(
                   generate_series(0, CAST((n_samples - 1) // 4 AS BIGINT)),
                   j -> s[CAST(j * 4 + 1 AS INT)]) AS ks
          FROM p)
        SELECT media_id, rate_out,
               CAST(len(ks) AS INT) AS n_out,
               CAST(list_sum(ks) AS BIGINT) AS sum_s,
               CAST(list_sum(list_transform(ks, v -> v * v)) AS BIGINT)
                 AS sumsq,
               CAST(list_max(list_transform(ks, v -> abs(v))) AS INT)
                 AS peak,
               CAST(ks[1] AS INT) AS first_s,
               CAST(ks[len(ks)] AS INT) AS last_s
        FROM d ORDER BY media_id"""))
  )
}
