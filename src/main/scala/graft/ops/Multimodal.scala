package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-wise batch transforms.
  *
  * The Spark-side shape is real and tested — binary columns, metadata
  * structs, `mapPartitions` batching (the Scala analogue of Python's
  * `mapInPandas`: one iterator per partition so a decoder can amortize
  * model/codec setup across rows). The actual media decoding is STUBBED
  * (this container has no image/audio codecs): `decodeStub` derives
  * deterministic fake dimensions/features from the bytes. Swap
  * `decodeStub` for a real codec without touching any of the plumbing.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a string column as a fake binary media payload (for testdata,
    * which ships no real media). */
  def asBinaryPayload(df: DataFrame, srcCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, col(srcCol).cast(BinaryType))

  /** Header-level media decode: REAL container parsing for PNG (IHDR),
    * JPEG (SOF frame segments), and WAV (fmt chunk: sample-rate/channels
    * mapped onto width/height) — pure byte reading, no codec library.
    * Unknown payloads fall back to a deterministic pseudo-decode
    * (content-hash-derived dimensions, stable for testing). Pixel-level
    * decoding stays stubbed: swap [[withFeatures]]' extractor for a real
    * model without touching the plumbing. */
  private[ops] def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

    if (bytes == null || bytes.isEmpty) ("empty", 0, 0)
    // PNG: 8-byte signature, then IHDR chunk: width/height big-endian at 16/20
    else if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G')
      ("png", be32(16), be32(20))
    // JPEG: walk marker segments to the first SOFn (C0-CF except C4/C8/CC)
    else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      var res: Option[(Int, Int)] = None
      while (res.isEmpty && i + 9 < bytes.length && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
          res = Some((be16(i + 7), be16(i + 5))) // (width, height)
        else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2 // bare markers
        else i += 2 + be16(i + 2) // skip segment by length
      }
      res.map(wh => ("jpeg", wh._1, wh._2)).getOrElse(("jpeg", 0, 0))
    }
    // WAV: RIFF....WAVE, fmt chunk at 12: channels @22 (LE16), rate @24 (LE32)
    else if (bytes.length >= 28 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F'
      && u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E')
      ("wav", le32(24), le16(22)) // width = sample rate, height = channels
    // BMP: 'BM' + BITMAPINFOHEADER (DIB size 40 LE32 @14 — the NUL bytes
    // that encoding requires cannot occur in UTF-8 text payloads, so a
    // document spelling "BM..." can never misfire this branch)
    else if (bytes.length >= 54 && u8(0) == 'B' && u8(1) == 'M' && le32(14) == 40)
      ("bmp", le32(18), math.abs(le32(22)))
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
      ("raw", 64 + math.floorMod(h, 1024).toInt, 64 + math.floorMod(h >> 10, 1024).toInt)
    }
  }

  /** Partition-wise decode + metadata extraction over a binary column.
    * `mapPartitions` (not a per-row UDF) so a real decoder can initialize
    * once per partition and process rows as a batch — the same execution
    * shape `mapInPandas` gives PySpark. Output schema: input columns +
    * `media_meta` struct. */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("media_meta", mediaMetaType))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition init happens here (codec/model handle in real impl)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (fmt, w, h) = decodeStub(bytes)
        val nb: Long = if (bytes == null) 0L else bytes.length.toLong
        Row.fromSeq(r.toSeq :+ Row(fmt, w, h, nb))
      }
    }(enc)
  }

  val audioStatsType: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("mean", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType)))

  /** REAL 16-bit PCM WAV decode — no codec library, just the RIFF spec:
    * walk the chunk list to `fmt ` (require audio format 1 = PCM, 16 bits
    * per sample) and `data`, then decode the little-endian signed
    * samples normalized to [-1, 1) and fold sample statistics
    * (n, mean, RMS, |peak|). Chunk sizes are word-aligned per RIFF; a
    * truncated `data` chunk decodes the bytes actually present (crawl
    * payloads are routinely cut off — better real stats over the prefix
    * than a null). Returns None for anything that is not a PCM-16 WAV —
    * those formats (compressed audio, images) remain the documented
    * stub. */
  private[ops] def decodeWavPcm16(bytes: Array[Byte]): Option[(Long, Double, Double, Double)] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0L
    var walking = true
    while (walking && i + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val id = tag(i)
      val sz = le32(i + 4) // unsigned 32-bit, as Long
      if (id == "fmt " && i + 8 + 16 <= bytes.length)
        fmtOk = le16(i + 8) == 1 && le16(i + 8 + 14) == 16
      else if (id == "data" && dataOff < 0) { dataOff = i + 8; dataLen = sz }
      // advance in Long math: a corrupt size must end the walk, not wrap
      val next = i.toLong + 8L + sz + (sz & 1L)
      if (next <= i || next > Int.MaxValue) walking = false else i = next.toInt
    }
    if (!fmtOk || dataOff < 0) None
    else {
      val n = (math.min(dataLen, (bytes.length - dataOff).toLong) / 2).toInt
      var sum = 0.0; var sq = 0.0; var peak = 0.0
      var j = 0
      while (j < n) {
        val s = le16(dataOff + 2 * j).toShort.toDouble / 32768.0
        sum += s; sq += s * s
        val a = math.abs(s); if (a > peak) peak = a
        j += 1
      }
      if (n == 0) Some((0L, 0.0, 0.0, 0.0))
      else Some((n.toLong, sum / n, math.sqrt(sq / n), peak))
    }
  }

  /** Canonical 44-byte PCM-16 WAV header for `dataBytes` of sample data —
    * fixture/builder helper (specs hand-build payloads with it; m2 wraps
    * testdata bytes into REAL decodable WAVs in-plan). */
  def wavPcm16Header(dataBytes: Int, sampleRate: Int = 8000, channels: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  val imageStatsType: StructType = StructType(Seq(
    StructField("n_pixels", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL 24-bit uncompressed BMP pixel decode — no codec library, just
    * the DIB spec: require BITMAPINFOHEADER (size 40), BI_RGB (no
    * compression), 24 bpp, then walk the 4-byte-aligned pixel rows and
    * fold per-channel means over the BGR triples. Row order (bottom-up vs
    * top-down, the sign of the height field) does not affect the stats. A
    * truncated pixel array decodes the pixels actually present — same
    * prefix policy as [[decodeWavPcm16]]. Returns None for anything that
    * is not a 24-bpp uncompressed BMP — those formats (PNG, JPEG, ...)
    * remain the documented stub. */
  private[ops] def decodeBmp24(bytes: Array[Byte]): Option[(Long, Double, Double, Double)] = {
    if (bytes == null || bytes.length < 54) return None
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (u8(0) != 'B' || u8(1) != 'M' || le32(14) != 40) return None
    if (le16(28) != 24 || le32(30) != 0) return None
    val w = le32(18)
    val h = math.abs(le32(22))
    val dataOff = le32(10)
    if (w <= 0 || h == 0 || dataOff < 54) return None
    val stride = (3 * w + 3) & ~3
    var n = 0L; var sr = 0.0; var sg = 0.0; var sb = 0.0
    var y = 0
    while (y < h) {
      val row = dataOff.toLong + y.toLong * stride
      var x = 0
      while (x < w && row + 3 * x + 2 < bytes.length) {
        val base = (row + 3 * x).toInt
        sb += u8(base); sg += u8(base + 1); sr += u8(base + 2)
        n += 1; x += 1
      }
      y += 1
    }
    if (n == 0) Some((0L, 0.0, 0.0, 0.0))
    else Some((n, sr / n, sg / n, sb / n))
  }

  /** Canonical 54-byte 24-bpp BMP header for a `w` x `h` image —
    * fixture/builder helper (specs hand-build payloads with it; m2 wraps
    * testdata bytes into REAL decodable BMPs in-plan). Callers supply
    * `h * ((3*w + 3) & ~3)` bytes of BGR pixel data after it. */
  def bmp24Header(w: Int, h: Int): Array[Byte] = {
    val stride = (3 * w + 3) & ~3
    val dataBytes = stride * h
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataBytes)
      .putInt(0).putInt(54)          // reserved, pixel-data offset
      .putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, width, height
      .putShort(1).putShort(24)       // planes, bpp
      .putInt(0).putInt(dataBytes)    // BI_RGB, image size
      .putInt(2835).putInt(2835)      // 72 dpi
      .putInt(0).putInt(0)            // palette
    bb.array()
  }

  /** Partition-wise REAL image decode over a binary column: adds an
    * `image_stats` struct (n_pixels, per-channel means) for 24-bpp
    * uncompressed BMP payloads, null for every other format (whose pixel
    * decode remains the documented stub). Same `mapPartitions` batch
    * shape as [[withMediaMeta]]. */
  def withImageStats(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("image_stats", imageStatsType))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val stats = decodeBmp24(r.getAs[Array[Byte]](payloadIdx))
          .map { case (n, mr, mg, mb) => Row(n, mr, mg, mb) }.orNull
        Row.fromSeq(r.toSeq :+ stats)
      }
    }(enc)
  }

  /** Partition-wise REAL audio decode over a binary column: adds an
    * `audio_stats` struct (n_samples, mean, rms, peak) for PCM-16 WAV
    * payloads, null for every other format (whose pixel/sample decode
    * remains the documented stub). Same `mapPartitions` batch shape as
    * [[withMediaMeta]]. */
  def withAudioStats(df: DataFrame, payloadCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("audio_stats", audioStatsType))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val stats = decodeWavPcm16(r.getAs[Array[Byte]](payloadIdx))
          .map { case (n, mean, rms, peak) => Row(n, mean, rms, peak) }.orNull
        Row.fromSeq(r.toSeq :+ stats)
      }
    }(enc)
  }

  /** STUB feature extractor: fixed-width float feature vector per payload
    * (deterministic from bytes; a real impl would run an encoder model).
    * Emitted as `array<float>` so downstream Similarity ops apply as-is. */
  def withFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val feats = new Array[Float](dim)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            feats(i % dim) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
          val n = math.sqrt(feats.map(f => f.toDouble * f).sum).toFloat
          if (n > 0) { var j = 0; while (j < dim) { feats(j) /= n; j += 1 } }
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Deterministic frame-sampling stub for video-like payloads: byte-range
    * "frames" every `stride` bytes, each tagged with its offset — the
    * explode/partitioning shape of real frame extraction. */
  def sampleFrames(df: DataFrame, payloadCol: String, stride: Int = 1024): DataFrame =
    df.withColumn("frame_offset",
        explode(sequence(lit(0), greatest(length(col(payloadCol)) - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame_offset + 1, $stride)"))
}
