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

  /** STUB decoder: deterministic pseudo-decode of a media payload.
    * Real implementation would parse the container header (JPEG/PNG/WAV).
    * Here: format from magic-byte heuristic, dimensions derived from
    * content hash — stable across runs for testing. */
  private[ops] def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes == null || bytes.isEmpty) ("empty", 0, 0)
    else {
      val fmt = bytes(0) match {
        case b if (b & 0xFF) == 0xFF => "jpeg-ish"
        case b if (b & 0xFF) == 0x89 => "png-ish"
        case _                       => "raw"
      }
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      (fmt, w, ht)
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
