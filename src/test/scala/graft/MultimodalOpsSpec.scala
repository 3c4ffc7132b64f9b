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

  test("MediaCodec round-trips its own spec-conformant headers") {
    import graft.operators.MediaCodec
    val png = MediaCodec.decode(MediaCodec.buildPng(640, 480, colorType = 6))
    assert(png === MediaCodec.MediaInfo("png", valid = true,
      Some(640), Some(480), Some(4), None, None))
    // every PNG color type maps to its channel count
    assert(MediaCodec.decode(MediaCodec.buildPng(5, 7, colorType = 0))
      .channels === Some(1))
    assert(MediaCodec.decode(MediaCodec.buildPng(5, 7, colorType = 2))
      .channels === Some(3))
    assert(MediaCodec.decode(MediaCodec.buildPng(5, 7, colorType = 4))
      .channels === Some(2))

    val jpg = MediaCodec.decode(MediaCodec.buildJpeg(1920, 1080, channels = 3))
    assert(jpg === MediaCodec.MediaInfo("jpeg", valid = true,
      Some(1920), Some(1080), Some(3), None, None))
    assert(MediaCodec.decode(MediaCodec.buildJpeg(8, 8, channels = 1))
      .channels === Some(1))

    val gif = MediaCodec.decode(MediaCodec.buildGif(320, 200))
    assert(gif === MediaCodec.MediaInfo("gif", valid = true,
      Some(320), Some(200), None, None, None))

    // FLAC STREAMINFO: 44.1 kHz stereo, 88200 samples = exactly 2 s
    val flac = MediaCodec.decode(MediaCodec.buildFlac(44100, 2, 88200L))
    assert(flac === MediaCodec.MediaInfo("flac", valid = true,
      None, None, Some(2), Some(44100), Some(2000L)))
    // >32-bit total-sample counts use the 36-bit field
    assert(MediaCodec.decode(MediaCodec.buildFlac(8000, 1, 1L << 33))
      .duration_ms === Some((1L << 33) * 1000 / 8000))
    // zero total samples is legal FLAC (length unknown): valid, no duration
    val unknownLen = MediaCodec.decode(MediaCodec.buildFlac(48000, 8, 0L))
    assert(unknownLen.valid && unknownLen.duration_ms.isEmpty &&
      unknownLen.channels === Some(8))

    // 44.1 kHz stereo 16-bit, 1s of samples: byteRate = 176400
    val wav = MediaCodec.decode(MediaCodec.buildWav(44100, 2, 16, 176400))
    assert(wav === MediaCodec.MediaInfo("wav", valid = true,
      None, None, Some(2), Some(44100), Some(1000L)))
    // duration is integer ms of dataBytes/byteRate
    assert(MediaCodec.decode(MediaCodec.buildWav(8000, 1, 16, 4000))
      .duration_ms === Some(250L))
  }

  test("MediaCodec parses all three WEBP flavors and tells RIFF " +
    "families apart") {
    import graft.operators.MediaCodec
    // VP8X (extended): canvas as 24-bit minus-one fields, alpha flag
    assert(MediaCodec.decode(MediaCodec.buildWebp(1024, 768)) ===
      MediaCodec.MediaInfo("webp", valid = true, Some(1024), Some(768),
        Some(3), None, None))
    assert(MediaCodec.decode(MediaCodec.buildWebp(16384, 2, alpha = true))
      .channels === Some(4))
    // VP8L (lossless): 0x2f signature then 14-bit packed minus-one dims
    def vp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | (if (alpha) 1 << 28 else 0)
      val out = java.nio.ByteBuffer.allocate(26)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(18).put("WEBP".getBytes)
      out.put("VP8L".getBytes).putInt(6)
      out.put(0x2f.toByte).putInt(bits).put(0.toByte)
      out.array()
    }
    assert(MediaCodec.decode(vp8l(100, 50, alpha = false)) ===
      MediaCodec.MediaInfo("webp", valid = true, Some(100), Some(50),
        Some(3), None, None))
    assert(MediaCodec.decode(vp8l(7, 9, alpha = true)).channels === Some(4))
    // VP8 (lossy): 9d 01 2a start code then 14-bit LE dims
    def vp8(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(30)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(22).put("WEBP".getBytes)
      out.put("VP8 ".getBytes).putInt(10)
      out.put(0.toByte).put(0.toByte).put(0.toByte) // frame tag
      out.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
      out.putShort(w.toShort).putShort(h.toShort)
      out.array()
    }
    assert(MediaCodec.decode(vp8(320, 240)) ===
      MediaCodec.MediaInfo("webp", valid = true, Some(320), Some(240),
        Some(3), None, None))
    // RIFF disambiguation: WAVE is wav, WEBP is webp, anything else in
    // the family is an invalid wav-sniff, not a phantom parse
    assert(MediaCodec.sniff(MediaCodec.buildWav(8000, 1, 16, 4)) === "wav")
    assert(MediaCodec.sniff(MediaCodec.buildWebp(2, 2)) === "webp")
  }

  test("MediaCodec never throws: every prefix truncation of every " +
    "format and corrupt magics decode as invalid rows") {
    import graft.operators.MediaCodec
    val fixtures = Seq(
      "png" -> MediaCodec.buildPng(100, 50),
      "jpeg" -> MediaCodec.buildJpeg(100, 50),
      "gif" -> MediaCodec.buildGif(100, 50),
      "wav" -> MediaCodec.buildWav(8000, 1, 16, 64),
      "webp" -> MediaCodec.buildWebp(100, 50),
      "flac" -> MediaCodec.buildFlac(44100, 2, 88200L))
    fixtures.foreach { case (fmt, full) =>
      val fullInfo = MediaCodec.decode(full)
      assert(fullInfo.valid, s"$fmt full must parse")
      // every strict prefix: never an exception, never a phantom parse —
      // a prefix either fails (header incomplete) or, once the header is
      // complete, parses EXACTLY the facts the full blob parses
      (0 until full.length).foreach { n =>
        val info = MediaCodec.decode(full.take(n))
        if (info.valid)
          assert(info === fullInfo,
            s"$fmt prefix $n parsed different facts than the full blob")
      }
      // below any plausible header there is nothing to phantom-parse
      (0 until 10).foreach { n =>
        assert(!MediaCodec.decode(full.take(n)).valid,
          s"$fmt truncated at $n must be invalid")
      }
    }
    // corrupt payloads behind a valid magic
    val noIhdr = MediaCodec.buildPng(9, 9)
    System.arraycopy("XXXX".getBytes, 0, noIhdr, 12, 4)
    assert(!MediaCodec.decode(noIhdr).valid)
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte) // SOI then EOI
    assert(MediaCodec.decode(noSof) ===
      MediaCodec.MediaInfo("jpeg", valid = false, None, None, None, None, None))
    // a foreign RIFF container is unknown, never a phantom wav — and a
    // RIFF truncated before its form type likewise
    val riffNotWave = MediaCodec.buildWav(8000, 1, 16, 4)
    System.arraycopy("AVI ".getBytes, 0, riffNotWave, 8, 4)
    assert(MediaCodec.decode(riffNotWave) ===
      MediaCodec.MediaInfo("unknown", valid = false,
        None, None, None, None, None))
    assert(MediaCodec.sniff(riffNotWave.take(10)) === "unknown")
    // a corrupt u32 sample rate must not narrow into a negative "valid"
    val hugeRate = MediaCodec.buildWav(8000, 1, 16, 4)
    hugeRate(27) = 0x80.toByte // sampleRate LE u32 -> 0x80000000 + 8000
    assert(!MediaCodec.decode(hugeRate).valid)
    // spec-legal 0xff FILL bytes before markers parse fine
    val jf = MediaCodec.buildJpeg(33, 44)
    val filled = jf.take(2) ++ Array.fill(3)(0xff.toByte) ++ jf.drop(2)
    assert(MediaCodec.decode(filled) ===
      MediaCodec.MediaInfo("jpeg", valid = true, Some(33), Some(44),
        Some(3), None, None))
    // wav whose declared data size overruns the actual bytes = corrupt
    val overrun = MediaCodec.buildWav(8000, 1, 16, 64).dropRight(8)
    assert(!MediaCodec.decode(overrun).valid)
    assert(MediaCodec.decode(Array.empty[Byte]).format === "unknown")
    assert(MediaCodec.decode(null).format === "unknown")
    assert(MediaCodec.decode("plain text bytes".getBytes).format === "unknown")
  }

  test("decodeHeaders: partition-parallel real decoding over mixed blobs, " +
    "poison rows surface as invalid rows") {
    import graft.operators.MediaCodec
    val blobs = Seq(
      (0L, MediaCodec.buildPng(12, 34)),
      (1L, MediaCodec.buildJpeg(56, 78)),
      (2L, MediaCodec.buildGif(90, 12)),
      (3L, MediaCodec.buildWav(16000, 2, 16, 8000)),
      (4L, "not media at all".getBytes),
      (5L, MediaCodec.buildPng(12, 34).take(10))) // truncated
      .toDF("media_id", "blob")
    val out = MultimodalOps.decodeHeaders(blobs)
      .collect().map(h => h.media_id -> h).toMap
    assert(out(0L).format === "png" && out(0L).width === Some(12))
    assert(out(1L).format === "jpeg" && out(1L).height === Some(78))
    assert(out(2L).format === "gif" && out(2L).channels === None)
    assert(out(3L).sample_rate === Some(16000))
    assert(out(3L).duration_ms === Some(8000L * 1000 / (16000 * 2 * 2)))
    assert(out(4L).format === "unknown" && !out(4L).valid)
    assert(out(5L).format === "png" && !out(5L).valid)
  }

  test("patchify: ragged last patch, hashes match an independent digest, " +
    "empty blobs yield one empty patch, guards reject misuse") {
    def md5hex(bs: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bs)
        .map("%02x".format(_)).mkString
    val payload = "abcdefghij".getBytes // 10 bytes, patch 4 -> 4,4,2
    val blobs = Seq((0L, payload), (1L, Array.emptyByteArray))
      .toDF("media_id", "blob")
    val out = MultimodalOps.patchify(blobs, "media_id", "blob", 4)
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      (0L, 0, 4, md5hex("abcd".getBytes)),
      (0L, 1, 4, md5hex("efgh".getBytes)),
      (0L, 2, 2, md5hex("ij".getBytes)),
      (1L, 0, 0, md5hex(Array.emptyByteArray))))
    intercept[IllegalArgumentException] {
      MultimodalOps.patchify(blobs, "media_id", "blob", 0)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.patchify(
        blobs.withColumn("patch_no", lit(1)), "media_id", "blob", 4)
    }
  }

  test("pcmStats inverts buildWavTone exactly; non-PCM and truncated " +
    "blobs are invalid rows, never exceptions") {
    import graft.operators.MediaCodec
    val id = 7L
    val n = ((id % 20) + 1).toInt * 128
    val ref = (0 until n).map(k => ((id * 31 + k * 17) % 2003 - 1001).toInt)
    val Some((rate, got_n, mn, mx, sum, sumSq)) =
      MediaCodec.pcmStats(MediaCodec.buildWavTone(id))
    assert(rate === (8000 + (id % 7) * 2000).toInt)
    assert(got_n === n)
    assert(mn === ref.min && mx === ref.max)
    assert(sum === ref.map(_.toLong).sum)
    assert(sumSq === ref.map(s => s.toLong * s).sum)
    // negative samples must decode sign-extended, and some exist
    assert(mn < 0)
    // poison: a PNG, every truncation of the tone, and garbage
    assert(MediaCodec.pcmStats(MediaCodec.buildFixture(0)).isEmpty) // png
    val tone = MediaCodec.buildWavTone(3L)
    (0 to 45).foreach { cut =>
      assert(MediaCodec.pcmStats(tone.take(cut)).isEmpty, s"cut $cut")
    }
    assert(MediaCodec.pcmStats("garbage".getBytes).isEmpty)
    // a 16-bit WAV whose fmt audio-format code is NOT 1 (linear PCM) —
    // e.g. 2 = ADPCM — must be rejected, not decoded as linear samples
    // (ADVICE r13: the format tag lives at fmt data offset +0)
    val adpcm = MediaCodec.buildWavTone(3L).clone()
    adpcm(20) = 2.toByte // le16 fmt code at chunk offset 12+8
    assert(MediaCodec.pcmStats(adpcm).isEmpty)
    assert(MediaCodec.pcmSamples(adpcm).isEmpty)
    // the typed dataset pass carries the same facts
    val out = MultimodalOps.pcmSampleStats(
      Seq((id, MediaCodec.buildWavTone(id)),
        (99L, "not a wav".getBytes)).toDF("media_id", "blob"))
      .collect().sortBy(_.media_id)
    assert(out(0).valid && out(0).sum_s.contains(sum))
    assert(!out(1).valid && out(1).n_samples.isEmpty)
  }

  test("pcmFrames: frames tile the sample stream with a true-length " +
    "partial tail, aggregates match a per-frame refold, poison blobs " +
    "emit nothing") {
    import graft.operators.MediaCodec
    val id = 4L // n = 640 samples: 640/48 = 13 full frames + tail of 16
    val Some((_, samples)) = MediaCodec.pcmSamples(MediaCodec.buildWavTone(id))
    val out = MultimodalOps.pcmFrames(
      Seq((id, MediaCodec.buildWavTone(id)),
        (99L, "not a wav".getBytes)).toDF("media_id", "blob"),
      frameSize = 48)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(out.forall(_.media_id == id)) // poison blob contributed 0 rows
    val ref = samples.grouped(48).toSeq
    assert(out.length === ref.length)
    assert(out.last.n_f === samples.length % 48) // true-length tail
    out.zip(ref).foreach { case (f, rs) =>
      assert(f.n_f === rs.length)
      assert(f.peak === rs.map(math.abs).max)
      assert(f.sumsq === rs.map(v => v.toLong * v).sum)
    }
    // frames tile: lengths sum back to the stream
    assert(out.map(_.n_f).sum === samples.length)
  }

  test("energySegments: gate is strict (> threshold), adjacent active " +
    "frames merge across a partial tail, gaps split, abs peak, poison " +
    "blobs and all-quiet blobs emit nothing") {
    import graft.operators.MediaCodec
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val b = MediaCodec.buildWav(8000, 1, 16, samples.length * 2)
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.zipWithIndex.foreach { case (v, i) =>
        bb.putShort(44 + i * 2, v.toShort)
      }
      b
    }
    // frameSize 4, threshold 100 (strict >):
    //   f0 [10,10,10,10]  sumsq 400  ACTIVE  -> segment A = [0,0]
    //   f1 [1,1,1,1]      sumsq 4    quiet
    //   f2 [10,0,0,0]     sumsq 100  quiet (boundary: 100 is NOT > 100)
    //   f3 [-20,0,0,0]    sumsq 400  ACTIVE (peak from abs)
    //   f4 [6,5,5,5]      sumsq 111  ACTIVE
    //   f5 [30,30] (tail) sumsq 1800 ACTIVE -> segment B = [3,5], 10 samples
    val samples = Seq(10, 10, 10, 10, 1, 1, 1, 1, 10, 0, 0, 0,
      -20, 0, 0, 0, 6, 5, 5, 5, 30, 30)
    val blobs = Seq(
      (1L, wavOf(samples)),
      (2L, wavOf(Seq(1, 1, 1, 1, 1))), // all-quiet: no segments
      (99L, "not a wav".getBytes)).toDF("media_id", "blob")
    val out = MultimodalOps.energySegments(blobs, frameSize = 4,
      sumsqThreshold = 100L)
      .orderBy($"media_id", $"seg_idx")
      .select($"media_id", $"seg_idx", $"seg_start", $"seg_end",
        $"n_frames", $"n_samples", $"seg_peak", $"seg_rms")
      .as[(Long, Int, Int, Int, Int, Long, Int, Double)].collect()
    assert(out.length === 2)
    assert(out(0) === ((1L, 1, 0, 0, 1, 4L, 10,
      BigDecimal(math.sqrt(400.0 / 4)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(1) === ((1L, 2, 3, 5, 3, 10L, 30,
      BigDecimal(math.sqrt((400.0 + 111 + 1800) / 10)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("pcmDecimate: strided aggregates match a hand refold, factor 1 " +
    "keeps everything, factor beyond length keeps only sample 0, poison " +
    "blobs emit nothing, factor guard") {
    import graft.operators.MediaCodec
    val id = 4L
    val Some((rate, samples)) =
      MediaCodec.pcmSamples(MediaCodec.buildWavTone(id))
    def run(factor: Int) = MultimodalOps.pcmDecimate(
      Seq((id, MediaCodec.buildWavTone(id)),
        (99L, "not a wav".getBytes)).toDF("media_id", "blob"), factor)
      .collect().toSeq
    def expect(factor: Int) = {
      val kept = samples.indices.filter(_ % factor == 0).map(samples(_))
      (id, rate / factor, kept.length,
        kept.map(_.toLong).sum, kept.map(v => v.toLong * v).sum,
        kept.map(math.abs).max, kept.head, kept.last)
    }
    for (f <- Seq(1, 4, 7)) {
      val out = run(f)
      assert(out.length === 1, s"factor $f: poison blob contributed rows")
      val d = out.head
      assert((d.media_id, d.rate_out, d.n_out, d.sum_s, d.sumsq, d.peak,
        d.first_s, d.last_s) === expect(f), s"factor $f")
    }
    val solo = run(samples.length + 10).head
    assert(solo.n_out === 1 && solo.first_s === samples.head &&
      solo.last_s === samples.head)
    intercept[IllegalArgumentException] {
      MultimodalOps.pcmDecimate(Seq((1L, Array[Byte]()))
        .toDF("media_id", "blob"), 0)
    }
  }
}
