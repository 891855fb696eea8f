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
