package graft.operators

/** Pure-JVM media container codec: parses the PUBLIC header formats
  * (PNG, JPEG/JFIF, GIF, RIFF/WAVE, RIFF/WEBP, FLAC) for dimensions /
  * channel layout /
  * duration directly from the leading bytes of a blob — the real
  * implementation behind [[MultimodalOps.decodeReal]] (this container
  * ships no image/audio libraries, but container headers are plain
  * public byte layouts and need none).
  *
  * Every parser is defensive: truncated, corrupt, or foreign bytes
  * yield `valid = false` (format = the sniffed magic when one matched,
  * "unknown" otherwise) — NEVER an exception, because one poison blob
  * must not kill a 100 TB decode pass; per-row failure surfaces as a
  * row, filterable and countable downstream (MultimodalOpsSpec pins
  * truncations at every prefix length).
  *
  * The deterministic `build*` synthesizers emit real, spec-conformant
  * headers (the same byte layouts the parsers read) so fixtures and the
  * `m3_decode_real` oracle can exercise the true parse path with
  * expected values that are pure arithmetic in the row id.
  */
object MediaCodec {

  /** Parsed header facts; absent fields are None (e.g. audio has no
    * width, palette GIFs no fixed channel count).
    */
  final case class MediaInfo(
      format: String,
      valid: Boolean,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  private def invalid(format: String) =
    MediaInfo(format, valid = false, None, None, None, None, None)

  // ---- byte readers (bounds are the CALLER's job — all uses below are
  // guarded by explicit length checks first) ----
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Sniff the container by magic. "unknown" when nothing matches. */
  def sniff(b: Array[Byte]): String =
    if (b == null || b.length < 4) "unknown"
    else if (b.length >= 8 && b.take(8).sameElements(pngSig)) "png"
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) "jpeg"
    else if (ascii(b, 0, 4) == "GIF8") "gif"
    else if (ascii(b, 0, 4) == "fLaC") "flac"
    else if (ascii(b, 0, 4) == "RIFF") {
      // RIFF is a family: the form type at offset 8 decides. A foreign
      // RIFF (AVI, ANI) or one truncated before its form type is
      // "unknown", not a phantom wav — per-format corruption counts
      // must not attribute foreign containers to wav.
      if (b.length < 12) "unknown"
      else ascii(b, 8, 4) match {
        case "WAVE" => "wav"
        case "WEBP" => "webp"
        case _ => "unknown"
      }
    } else "unknown"

  /** Parse whatever container the magic says. Never throws. */
  def decode(b: Array[Byte]): MediaInfo = sniff(b) match {
    case "png" => decodePng(b)
    case "jpeg" => decodeJpeg(b)
    case "gif" => decodeGif(b)
    case "wav" => decodeWav(b)
    case "webp" => decodeWebp(b)
    case "flac" => decodeFlac(b)
    case other => invalid(other)
  }

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per the
    * spec): 4-byte length, "IHDR", width/height as big-endian u32,
    * bit depth, color type. Channels derive from the color type
    * (grayscale 1, rgb 3, palette 1, gray+alpha 2, rgba 4).
    */
  private def decodePng(b: Array[Byte]): MediaInfo = {
    if (b.length < 26 || ascii(b, 12, 4) != "IHDR") invalid("png")
    else {
      val w = be32(b, 16)
      val h = be32(b, 20)
      val channels = u8(b, 25) match {
        case 0 => Some(1); case 2 => Some(3); case 3 => Some(1)
        case 4 => Some(2); case 6 => Some(4); case _ => None
      }
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
        channels.isEmpty) invalid("png")
      else MediaInfo("png", valid = true, Some(w.toInt), Some(h.toInt),
        channels, None, None)
    }
  }

  /** JPEG/JFIF: SOI then a marker walk. Dimensions live in the first
    * start-of-frame segment (SOF0..SOF15, excluding DHT/JPG/DAC =
    * C4/C8/CC): precision u8, height/width big-endian u16, component
    * count = channels. Stops at SOS/EOI — a stream with no SOF before
    * its entropy data is corrupt.
    */
  private def decodeJpeg(b: Array[Byte]): MediaInfo = {
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return invalid("jpeg")
      // the spec allows any number of 0xff FILL bytes before a marker;
      // real encoders emit them — skip to the marker byte proper
      if (u8(b, i + 1) == 0xff) { i += 1 }
      else {
      val marker = u8(b, i + 1)
      if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) i += 2 // parameterless markers
      else if (marker == 0xd9 || marker == 0xda) return invalid("jpeg")
      else if (i + 3 >= b.length) return invalid("jpeg")
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2 || i + 2 + segLen > b.length) return invalid("jpeg")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (segLen < 8) return invalid("jpeg")
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val ncomp = u8(b, i + 9)
          return if (w <= 0 || h <= 0 || ncomp <= 0) invalid("jpeg")
          else MediaInfo("jpeg", valid = true, Some(w), Some(h),
            Some(ncomp), None, None)
        }
        i += 2 + segLen
      }
      }
    }
    invalid("jpeg")
  }

  /** GIF87a/GIF89a: width/height as little-endian u16 in the logical
    * screen descriptor. Pixel depth is palette-driven, so no fixed
    * channel count is reported.
    */
  private def decodeGif(b: Array[Byte]): MediaInfo = {
    val version = if (b.length >= 6) ascii(b, 4, 2) else ""
    if (b.length < 10 || (version != "7a" && version != "9a")) invalid("gif")
    else {
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w <= 0 || h <= 0) invalid("gif")
      else MediaInfo("gif", valid = true, Some(w), Some(h), None, None, None)
    }
  }

  /** RIFF/WAVE: chunk walk from offset 12. `fmt ` carries channels,
    * sample rate, byte rate, bits per sample; `data` carries the
    * payload size, and duration_ms = dataSize * 1000 / byteRate. Valid
    * needs BOTH chunks, a positive byte rate, and the declared data to
    * actually fit the blob (a truncated payload is corrupt). Chunks are
    * word-aligned per the RIFF spec.
    */
  private def decodeWav(b: Array[Byte]): MediaInfo = {
    if (b.length < 12 || ascii(b, 8, 4) != "WAVE") return invalid("wav")
    var i = 12
    var channels = -1
    var sampleRate = -1L
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return invalid("wav")
      if (id == "fmt ") {
        if (size < 16) return invalid("wav")
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (id == "data") dataSize = size
      i += 8 + size.toInt + (size.toInt & 1)
    }
    // u32 fields are read as Long; a corrupt header declaring e.g.
    // sampleRate >= 2^31 must NOT narrow into a negative "valid" value
    if (channels <= 0 || sampleRate <= 0 || sampleRate > Int.MaxValue ||
      byteRate <= 0 || dataSize < 0)
      invalid("wav")
    else MediaInfo("wav", valid = true, None, None, Some(channels),
      Some(sampleRate.toInt), Some(dataSize * 1000L / byteRate))
  }

  /** FLAC: the STREAMINFO metadata block (mandatory first block per
    * the spec) packs 20 bits of sample rate, 3 bits of channels-1 and
    * 36 bits of total samples into bytes 10..17 of its 34-byte body;
    * duration_ms = totalSamples * 1000 / sampleRate, absent when the
    * stream declares 0 total samples (legal: length unknown).
    */
  private def decodeFlac(b: Array[Byte]): MediaInfo = {
    // 4 magic + 4 block header + 34 STREAMINFO bytes
    if (b.length < 42 || (u8(b, 4) & 0x7f) != 0) return invalid("flac")
    val blockLen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (blockLen < 34) return invalid("flac")
    val o = 8
    val sampleRate =
      (u8(b, o + 10) << 12) | (u8(b, o + 11) << 4) | (u8(b, o + 12) >> 4)
    val channels = ((u8(b, o + 12) >> 1) & 0x7) + 1
    val totalSamples =
      ((u8(b, o + 13) & 0xf).toLong << 32) | (u8(b, o + 14).toLong << 24) |
        (u8(b, o + 15).toLong << 16) | (u8(b, o + 16).toLong << 8) |
        u8(b, o + 17).toLong
    if (sampleRate <= 0) invalid("flac")
    else MediaInfo("flac", valid = true, None, None, Some(channels),
      Some(sampleRate),
      if (totalSamples > 0) Some(totalSamples * 1000L / sampleRate) else None)
  }

  /** WEBP (RIFF): the first chunk decides the flavor. VP8X (extended)
    * carries the canvas as 24-bit LE minus-one fields at offsets 24/27;
    * VP8L (lossless) packs 14-bit minus-one dims into the bytes after
    * its 0x2f signature; VP8 (lossy) carries 14-bit dims in the frame
    * header after the 9d 01 2a start code. Channels: 4 when the VP8X
    * alpha flag (bit 4) or VP8L alpha bit is set, else 3.
    */
  private def decodeWebp(b: Array[Byte]): MediaInfo = {
    if (b.length < 20) return invalid("webp")
    val tag = ascii(b, 12, 4)
    val size = le32(b, 16)
    if (size < 0 || 20 + size > b.length) return invalid("webp")
    tag match {
      case "VP8X" =>
        if (size < 10 || b.length < 30) invalid("webp")
        else {
          val alpha = (u8(b, 20) & 0x10) != 0
          val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
          val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
          MediaInfo("webp", valid = true, Some(w), Some(h),
            Some(if (alpha) 4 else 3), None, None)
        }
      case "VP8L" =>
        if (size < 5 || u8(b, 20) != 0x2f) invalid("webp")
        else {
          val bits = le32(b, 21)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          val alpha = ((bits >> 28) & 1) != 0
          MediaInfo("webp", valid = true, Some(w), Some(h),
            Some(if (alpha) 4 else 3), None, None)
        }
      case "VP8 " =>
        // lossy frame header: 3-byte frame tag, 9d 01 2a start code,
        // then 14-bit width and height (low 14 of each LE u16)
        if (size < 10 || b.length < 30 ||
          u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a)
          invalid("webp")
        else {
          val w = (le16(b, 26) & 0x3fff)
          val h = (le16(b, 28) & 0x3fff)
          if (w <= 0 || h <= 0) invalid("webp")
          else MediaInfo("webp", valid = true, Some(w), Some(h),
            Some(3), None, None)
        }
      case _ => invalid("webp")
    }
  }

  // ---- deterministic synthesizers (real spec-conformant headers) ----

  /** Minimal well-formed PNG: signature, IHDR (8-bit, given color type),
    * zero CRC (parsers here don't checksum), empty IEND.
    */
  def buildPng(width: Int, height: Int, colorType: Int = 6): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    out.put(pngSig)
    out.putInt(13).put("IHDR".getBytes) // IHDR length + tag
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(colorType.toByte) // bit depth, color type
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.putInt(0) // CRC (unchecked)
    out.putInt(0).put("IEND".getBytes).putInt(0)
    out.array()
  }

  /** Minimal JFIF JPEG: SOI, APP0, SOF0 with the given geometry, EOI. */
  def buildJpeg(width: Int, height: Int, channels: Int = 3): Array[Byte] = {
    val sofLen = 8 + 3 * channels
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + sofLen + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0
    out.put("JFIF".getBytes).put(0.toByte)
    out.put(1.toByte).put(1.toByte).put(0.toByte) // version, units
    out.putShort(1).putShort(1).put(0.toByte).put(0.toByte) // density, thumb
    out.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort) // SOF0
    out.put(8.toByte).putShort(height.toShort).putShort(width.toShort)
    out.put(channels.toByte)
    (0 until channels).foreach { c =>
      out.put((c + 1).toByte).put(0x11.toByte).put(0.toByte)
    }
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  /** Minimal GIF89a: logical screen descriptor + trailer. */
  def buildGif(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(6 + 7 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes)
    out.putShort(width.toShort).putShort(height.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // flags, bg, aspect
    out.put(0x3b.toByte) // trailer
    out.array()
  }

  /** Minimal PCM WAV: RIFF header, canonical 16-byte fmt chunk, data
    * chunk of `dataBytes` zero samples.
    */
  def buildWav(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      dataBytes: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort).putInt(sampleRate)
    out.putInt(byteRate).putShort(blockAlign.toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes).putInt(dataBytes)
    out.array() // data payload stays zeroed
  }

  /** Minimal FLAC: magic + a last-block STREAMINFO with the given
    * stream parameters (frame/block sizes and md5 zeroed — the parsers
    * here read neither).
    */
  def buildFlac(
      sampleRate: Int,
      channels: Int,
      totalSamples: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(42)
    out.put("fLaC".getBytes)
    out.put(0x80.toByte) // last-metadata-block flag + type 0 (STREAMINFO)
    out.put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(4096.toShort).putShort(4096.toShort) // min/max block size
    out.put(Array.fill(6)(0.toByte)) // min/max frame size (unknown)
    out.put((sampleRate >> 12).toByte)
    out.put(((sampleRate >> 4) & 0xff).toByte)
    out.put((((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((16 - 1) >> 4)).toByte) // rate low | channels-1 | bps-1 high bit
    out.put(((((16 - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte)
    out.putInt((totalSamples & 0xffffffffL).toInt)
    out.array() // trailing 16 md5 bytes stay zeroed by allocation
  }

  /** Minimal extended (VP8X) WEBP: RIFF header + VP8X chunk with the
    * canvas size and optional alpha flag.
    */
  def buildWebp(width: Int, height: Int, alpha: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(22).put("WEBP".getBytes)
    out.put("VP8X".getBytes).putInt(10)
    out.put((if (alpha) 0x10 else 0x00).toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // reserved
    val w = width - 1
    val h = height - 1
    out.put((w & 0xff).toByte).put(((w >> 8) & 0xff).toByte)
      .put(((w >> 16) & 0xff).toByte)
    out.put((h & 0xff).toByte).put(((h >> 8) & 0xff).toByte)
      .put(((h >> 16) & 0xff).toByte)
    out.array()
  }

  /** A 16-bit mono PCM WAV whose samples are pure arithmetic in the id:
    * sample k = (id·31 + k·17) mod 2003 − 1001, n = (id mod 20 + 1)·128.
    * The m5 fixture — a SQL oracle recomputes every sample (and so every
    * aggregate of them) from the id without touching a byte.
    */
  def buildWavTone(id: Long): Array[Byte] = {
    val n = ((id % 20) + 1).toInt * 128
    val sampleRate = (8000 + (id % 7) * 2000).toInt
    val b = buildWav(sampleRate, channels = 1, bitsPerSample = 16,
      dataBytes = n * 2)
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(44)
    var k = 0
    while (k < n) {
      buf.putShort(((id * 31 + k * 17) % 2003 - 1001).toShort)
      k += 1
    }
    b
  }

  /** Shared RIFF chunk walk behind [[pcmStats]] and [[pcmSamples]]
    * (they previously duplicated it verbatim, so a validity fix could
    * silently miss one — ADVICE r13). Returns (sampleRate, dataOff,
    * dataLen) only for a valid 16-bit LINEAR-PCM WAV: the fmt chunk's
    * audio-format code (fmt data offset +0, i.e. le16 at chunk i+8)
    * must be 1 — a 16-bit ADPCM/companded WAV is NOT linear PCM and
    * decoding its bytes as samples would be silently wrong.
    */
  private def pcmHeaderWalk(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (sniff(b) != "wav") return None
    var i = 12
    var fmtCode = -1
    var sampleRate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        fmtCode = le16(b, i + 8)
        sampleRate = le32(b, i + 12).toInt
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = size.toInt
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmtCode != 1 || sampleRate <= 0 || bits != 16 || dataOff < 0 ||
      dataLen < 2) None
    else Some((sampleRate, dataOff, dataLen))
  }

  /** Exact integer statistics of a PCM WAV's sample stream (16-bit LE,
    * any channel count — channels interleave and aggregate together).
    * Integer min/max/sum/sum-of-squares only: every float derivation
    * (mean, RMS) belongs in the query layer where both engines share
    * the IEEE ops. Returns None for anything that is not a valid
    * 16-bit PCM WAV — poison blobs surface as invalid rows, never
    * exceptions (the decodeHeaders contract).
    */
  def pcmStats(b: Array[Byte]): Option[(Int, Int, Int, Int, Long, Long)] = {
    val (sampleRate, dataOff, dataLen) = pcmHeaderWalk(b) match {
      case Some(t) => t
      case None    => return None
    }
    val n = dataLen / 2
    var k = 0
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var sum = 0L
    var sumSq = 0L
    while (k < n) {
      val off = dataOff + k * 2
      val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      if (s < mn) mn = s
      if (s > mx) mx = s
      sum += s
      sumSq += s.toLong * s
      k += 1
    }
    Some((sampleRate, n, mn, mx, sum, sumSq))
  }

  /** The full decoded sample stream of a 16-bit PCM WAV (LE, channels
    * interleaved) plus its sample rate — [[pcmStats]]'s raw sibling for
    * operators that need per-sample access (framing, windowed DSP).
    * Same validity contract: None for anything not 16-bit PCM.
    */
  def pcmSamples(b: Array[Byte]): Option[(Int, Array[Int])] = {
    val (sampleRate, dataOff, dataLen) = pcmHeaderWalk(b) match {
      case Some(t) => t
      case None    => return None
    }
    val n = dataLen / 2
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      val off = dataOff + k * 2
      out(k) = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      k += 1
    }
    Some((sampleRate, out))
  }

  /** The m3 oracle fixture: one deterministic container per id, format
    * rotating by id % 5, every parameter pure arithmetic in the id (so
    * a SQL oracle recomputes the expected parse without any bytes).
    */
  def buildFixture(id: Long): Array[Byte] = {
    val w = (id % 199 + 1).toInt
    val h = (id % 97 + 1).toInt
    (id % 5) match {
      case 0 => buildPng(w, h, colorType = 6)
      case 1 => buildJpeg(w, h, channels = 3)
      case 2 => buildGif(w, h)
      case 3 => buildWav(
        sampleRate = (8000 + (id % 7) * 2000).toInt,
        channels = (id % 2 + 1).toInt,
        bitsPerSample = 16,
        dataBytes = ((id % 50 + 1) * 1024).toInt)
      case _ => buildWebp(w, h, alpha = id % 2 == 0)
    }
  }
}
