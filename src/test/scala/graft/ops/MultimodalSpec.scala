package graft.ops

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payloads = Multimodal.asBinaryPayload(
    Seq((1L, "hello world"), (2L, ""), (3L, "another payload here")).toDF("id", "text"),
    "text")

  test("withMediaMeta emits a typed struct, deterministically") {
    val out = Multimodal.withMediaMeta(payloads, "payload")
    out.schema("media_meta").dataType shouldBe Multimodal.mediaMetaType
    val rows = out.select("id", "media_meta.*").orderBy("id").collect()
    rows.length shouldBe 3
    val r1 = rows(0)
    r1.getAs[String]("format") shouldBe "raw"
    r1.getAs[Long]("n_bytes") shouldBe 11L
    r1.getAs[Int]("width") should be >= 64
    // empty payload
    rows(1).getAs[String]("format") shouldBe "empty"
    rows(1).getAs[Long]("n_bytes") shouldBe 0L
    // determinism: second run gives identical metadata
    val again = Multimodal.withMediaMeta(payloads, "payload")
      .select("id", "media_meta.*").orderBy("id").collect()
    again.map(_.toSeq) shouldBe rows.map(_.toSeq)
  }

  test("decode parses real PNG IHDR dimensions") {
    // PNG signature + IHDR chunk header + width=640, height=480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* 640 */ 0, 0, 0x01, 0xE0 /* 480 */).map(_.toByte)
    Multimodal.decodeStub(png) shouldBe ("png", 640, 480)
  }

  test("decode parses real JPEG SOF0 dimensions, skipping prior segments") {
    // SOI + APP0 (length 4, empty) + SOF0: len 11, precision 8, h=480, w=640
    val jpg = Array[Int](0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00, // APP0 segment, 2-byte payload
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x01, 0xE0, 0x02, 0x80, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    Multimodal.decodeStub(jpg) shouldBe ("jpeg", 640, 480)
  }

  test("decode parses real WAV fmt header (rate/channels)") {
    val wav = new Array[Byte](28)
    "RIFF".getBytes.copyToArray(wav, 0)
    "WAVE".getBytes.copyToArray(wav, 8)
    "fmt ".getBytes.copyToArray(wav, 12)
    wav(22) = 2 // channels LE16
    wav(24) = 0x44.toByte; wav(25) = 0xAC.toByte // 44100 LE32
    Multimodal.decodeStub(wav) shouldBe ("wav", 44100, 2)
  }

  test("decode falls back to deterministic pseudo-decode for unknown bytes") {
    Multimodal.decodeStub(Array[Byte]())._1 shouldBe "empty"
    val a = Multimodal.decodeStub("hello world".getBytes)
    a._1 shouldBe "raw"
    a shouldBe Multimodal.decodeStub("hello world".getBytes) // stable
  }

  test("withFeatures emits an L2-normalized fixed-width float vector") {
    val out = Multimodal.withFeatures(payloads, "payload", dim = 8)
      .select("id", "features").orderBy("id").collect()
    val f1 = out(0).getAs[scala.collection.Seq[Float]]("features")
    f1.length shouldBe 8
    math.sqrt(f1.map(x => x.toDouble * x).sum) shouldBe 1.0 +- 1e-5
    // empty payload -> zero vector
    out(1).getAs[scala.collection.Seq[Float]]("features").forall(_ == 0.0f) shouldBe true
  }

  test("features feed Similarity ops directly (array<float> contract)") {
    val feats = Multimodal.withFeatures(payloads.filter(col("id") =!= 2L), "payload", dim = 8)
    val self = feats.select(
      Similarity.cosine(col("features").cast("array<double>"),
        col("features").cast("array<double>")).as("c")).collect()
    all(self.map(_.getAs[Double]("c"))) shouldBe 1.0 +- 1e-6
  }

  // --- real PCM-16 WAV decode -----------------------------------------

  /** Known samples as a complete WAV payload via the canonical header. */
  private def wavOf(samples: Seq[Short], extraChunkBeforeData: Boolean = false): Array[Byte] = {
    val data = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(data.putShort)
    val hdr = Multimodal.wavPcm16Header(samples.length * 2)
    if (!extraChunkBeforeData) hdr ++ data.array()
    else {
      // splice a LIST junk chunk between fmt and data: the decoder must
      // WALK chunks, not assume data at offset 36
      val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      hdr.take(36) ++ junk ++ hdr.drop(36) ++ data.array()
    }
  }

  test("decodeWavPcm16 computes exact sample statistics from hand-built bytes") {
    // samples 0, +0.5, -0.5, 32767/32768, -1.0 (exact in binary64)
    val samples = Seq[Short](0, 16384, -16384, 32767, -32768)
    val (n, mean, rms, peak) = Multimodal.decodeWavPcm16(wavOf(samples)).get
    n shouldBe 5L
    val xs = samples.map(_.toDouble / 32768.0)
    mean shouldBe (xs.sum / 5) +- 1e-15
    rms shouldBe math.sqrt(xs.map(x => x * x).sum / 5) +- 1e-15
    peak shouldBe 1.0
  }

  test("decodeWavPcm16 walks chunks (junk chunk before data) and clamps truncated data") {
    val samples = Seq[Short](1000, -1000, 2000, -2000)
    Multimodal.decodeWavPcm16(wavOf(samples, extraChunkBeforeData = true))
      .map(_._1) shouldBe Some(4L)
    // truncate the payload mid-data: stats over the bytes actually present
    val cut = wavOf(samples).dropRight(4)
    Multimodal.decodeWavPcm16(cut).map(_._1) shouldBe Some(2L)
  }

  test("decodeWavPcm16 rejects non-WAV, non-PCM, and malformed payloads") {
    Multimodal.decodeWavPcm16(null) shouldBe None
    Multimodal.decodeWavPcm16("plain text payload far too short".getBytes) shouldBe None
    // valid RIFF/WAVE but float format (audioFormat=3) -> documented stub
    val floatWav = Multimodal.wavPcm16Header(8)
    floatWav(20) = 3
    Multimodal.decodeWavPcm16(floatWav ++ new Array[Byte](8)) shouldBe None
    // corrupt chunk size must terminate the walk, not loop or throw
    val corrupt = Multimodal.wavPcm16Header(8)
    corrupt(16) = 0xFF.toByte; corrupt(17) = 0xFF.toByte
    corrupt(18) = 0xFF.toByte; corrupt(19) = 0xFF.toByte
    noException should be thrownBy Multimodal.decodeWavPcm16(corrupt ++ new Array[Byte](8))
  }

  test("withAudioStats decodes WAV payloads in-plan, nulls the rest") {
    val wav = wavOf(Seq[Short](16384, -16384))
    val df = Seq((1L, wav), (2L, "not audio at all, just text bytes".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.withAudioStats(df, "payload")
      .select("id", "audio_stats").orderBy("id").collect()
    val s1 = out(0).getAs[Row]("audio_stats")
    s1.getAs[Long]("n_samples") shouldBe 2L
    s1.getAs[Double]("rms") shouldBe 0.5 +- 1e-15
    s1.getAs[Double]("peak") shouldBe 0.5 +- 1e-15
    out(1).isNullAt(1) shouldBe true
  }

  /** 2x2 24-bpp BMP: stride = (3*2+3)&~3 = 8, so each 6-byte BGR row
    * carries 2 padding bytes. Pixels chosen so the channel means are
    * exact in binary: B mean 20, G mean 40, R mean 80. */
  private def bmp2x2: Array[Byte] = {
    val px = Array[Int](
      10, 30, 70,   30, 50, 90,  0, 0, // row 0: (B,G,R) x2 + pad
      20, 40, 80,   20, 40, 80,  0, 0) // row 1
    Multimodal.bmp24Header(2, 2) ++ px.map(_.toByte)
  }

  test("decodeBmp24 computes exact per-channel means from hand-built bytes") {
    val (n, mr, mg, mb) = Multimodal.decodeBmp24(bmp2x2).get
    n shouldBe 4L
    mr shouldBe 80.0
    mg shouldBe 40.0
    mb shouldBe 20.0
    // header recognition in media_meta: same bytes decode as 2x2 bmp
    Multimodal.decodeStub(bmp2x2) shouldBe ("bmp", 2, 2)
    // top-down row order (negative height) yields the same stats
    val td = bmp2x2
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    Multimodal.decodeBmp24(td).get shouldBe ((4L, 80.0, 40.0, 20.0))
  }

  test("decodeBmp24 clamps truncated pixel data and rejects non-BMP payloads") {
    // cut after the first row: only 2 pixels decode (prefix policy)
    val cut = bmp2x2.take(54 + 8)
    Multimodal.decodeBmp24(cut).map(_._1) shouldBe Some(2L)
    Multimodal.decodeBmp24(null) shouldBe None
    Multimodal.decodeBmp24("plain text payload long enough to clear the length gate ok".getBytes) shouldBe None
    // 8-bpp BMP -> documented stub
    val bpp8 = bmp2x2
    bpp8(28) = 8
    Multimodal.decodeBmp24(bpp8) shouldBe None
    // RLE-compressed -> documented stub
    val rle = bmp2x2
    rle(30) = 1
    Multimodal.decodeBmp24(rle) shouldBe None
  }

  test("withImageStats decodes BMP payloads in-plan, nulls the rest") {
    val df = Seq((1L, bmp2x2), (2L, "not an image at all, just text bytes padded".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.withImageStats(df, "payload")
      .select("id", "image_stats").orderBy("id").collect()
    val s1 = out(0).getAs[Row]("image_stats")
    s1.getAs[Long]("n_pixels") shouldBe 4L
    s1.getAs[Double]("mean_r") shouldBe 80.0
    s1.getAs[Double]("mean_g") shouldBe 40.0
    s1.getAs[Double]("mean_b") shouldBe 20.0
    out(1).isNullAt(1) shouldBe true
  }

  test("decodePng8 round-trips known pixels through every scanline filter (0-4)") {
    // 3x3 RGB with full-range values so Sub/Up/Average/Paeth deltas wrap
    // through byte arithmetic; the decoder must reconstruct identical
    // channel means for every filter choice
    val pix = Array.tabulate(3 * 3 * 3)(i => ((i * 41 + 7) % 256).toByte)
    val expR = (0 until 9).map(p => pix(p * 3) & 0xFF).sum / 9.0
    val expG = (0 until 9).map(p => pix(p * 3 + 1) & 0xFF).sum / 9.0
    val expB = (0 until 9).map(p => pix(p * 3 + 2) & 0xFF).sum / 9.0
    for (ft <- 0 to 4) {
      val png = Multimodal.encodePng8(3, 3, pix, channels = 3, filterType = ft)
      withClue(s"filter $ft: ") {
        Multimodal.decodePng8(png) shouldBe Some((9L, expR, expG, expB))
      }
    }
  }

  test("decodePng8 handles RGBA (alpha excluded from means)") {
    val pix = Array.tabulate(2 * 2 * 4)(i => ((i * 37 + 3) % 256).toByte)
    val expR = Seq(0, 4, 8, 12).map(p => pix(p) & 0xFF).sum / 4.0
    val expG = Seq(1, 5, 9, 13).map(p => pix(p) & 0xFF).sum / 4.0
    val expB = Seq(2, 6, 10, 14).map(p => pix(p) & 0xFF).sum / 4.0
    for (ft <- 0 to 4) {
      val png = Multimodal.encodePng8(2, 2, pix, channels = 4, filterType = ft)
      Multimodal.decodePng8(png) shouldBe Some((4L, expR, expG, expB))
    }
  }

  test("decodePng8 decodes complete rows of a truncated stream, rejects other flavors") {
    // pseudo-random pixels resist deflate, so a mid-file cut really lands
    // inside the compressed stream
    val rnd = new scala.util.Random(7)
    val pix = Array.fill(16 * 16 * 3)(rnd.nextInt(256).toByte)
    val png = Multimodal.encodePng8(16, 16, pix)
    // cut inside IDAT: prefix policy — whatever complete rows inflate
    val cut = png.take(png.length / 2)
    val partial = Multimodal.decodePng8(cut)
    partial should not be None
    partial.get._1 should be < 256L
    partial.get._1 % 16 shouldBe 0L // whole scanlines only
    Multimodal.decodePng8(null) shouldBe None
    Multimodal.decodePng8("not a png, merely some text of sufficient length....".getBytes) shouldBe None
    // grayscale (color type 0) -> documented stub
    val gray = png.clone(); gray(25) = 0
    Multimodal.decodePng8(gray) shouldBe None
    // interlaced -> documented stub
    val adam7 = png.clone(); adam7(28) = 1
    Multimodal.decodePng8(adam7) shouldBe None
    // 16-bit depth -> documented stub
    val deep = png.clone(); deep(24) = 16
    Multimodal.decodePng8(deep) shouldBe None
  }

  test("withImageStats decodes PNG payloads in-plan alongside BMP") {
    val pix = Array.tabulate(2 * 2 * 3)(i => (10 * (i + 1)).toByte)
    val df = Seq((1L, Multimodal.encodePng8(2, 2, pix)), (2L, bmp2x2))
      .toDF("id", "payload")
    val out = Multimodal.withImageStats(df, "payload")
      .select("id", "image_stats").orderBy("id").collect()
    val s1 = out(0).getAs[Row]("image_stats")
    s1.getAs[Long]("n_pixels") shouldBe 4L
    s1.getAs[Double]("mean_r") shouldBe Seq(10, 40, 70, 100).sum / 4.0
    s1.getAs[Double]("mean_g") shouldBe Seq(20, 50, 80, 110).sum / 4.0
    out(1).getAs[Row]("image_stats").getAs[Long]("n_pixels") shouldBe 4L
  }

  test("resizeBmp box-resamples 4x4 -> 2x2 to exact bytes through a real BMP round-trip") {
    // stored pixel (x, y): B = 4y+x, G = 40+4y+x, R = 80+4y+x; each 2x2
    // block averages to ?.5 exactly, pinning the half-up rounding
    val body = Array.tabulate(4 * 12) { i =>
      val y = i / 12; val x = (i % 12) / 3
      val c = i % 3 // 0=B, 1=G, 2=R as stored
      (c * 40 + 4 * y + x).toByte
    }
    val df = Seq((1L, Multimodal.bmp24Header(4, 4) ++ body)).toDF("id", "payload")
    val resized = Multimodal.resizeBmp(df, "payload", 2, 2)
      .select("resized").head().getAs[Array[Byte]](0)
    val expect = Multimodal.bmp24Header(2, 2) ++ Array[Int](
      3, 43, 83, 5, 45, 85, 0, 0,    // row 0: (B,G,R) x2 + stride pad
      11, 51, 91, 13, 53, 93, 0, 0   // row 1
    ).map(_.toByte)
    resized shouldBe expect
    // and the resized payload is itself a decodable BMP with the means
    // of the rounded output pixels
    val (n, mr, mg, mb) = Multimodal.decodeBmp24(resized).get
    n shouldBe 4L
    mr shouldBe (83 + 85 + 91 + 93) / 4.0
    mg shouldBe (43 + 45 + 51 + 53) / 4.0
    mb shouldBe (3 + 5 + 11 + 13) / 4.0
  }

  test("boxResize: same-size resample is the exact identity") {
    // sx = sy = 1 -> every output box covers exactly one source pixel
    // with weight 1, so round(v/1) must return every byte unchanged,
    // including values above 127 (signed-byte round-trip)
    val rgb = Array.tabulate(7 * 5 * 3)(i => ((i * 37 + 200) % 256).toByte)
    Multimodal.boxResize(7, 5, rgb, 7, 5).toSeq shouldBe rgb.toSeq
  }

  test("boxResize: fractional boxes preserve constant images; non-BMP payloads null") {
    // 5x3 constant color -> 2x2: every fractional-area box averages the
    // same value, so the output must be exactly constant
    val const = Array.fill(5 * 3 * 3)(77.toByte)
    Multimodal.boxResize(5, 3, const, 2, 2).toSeq shouldBe Array.fill(2 * 2 * 3)(77.toByte).toSeq
    // upscale through the same weights: 1x1 -> 3x2 replicates the pixel
    val one = Array[Byte](10, 20, 30)
    Multimodal.boxResize(1, 1, one, 3, 2).toSeq shouldBe
      Array.tabulate(3 * 2 * 3)(i => one(i % 3)).toSeq
    // non-BMP payloads resize to null
    val df = Seq((1L, "not an image".getBytes)).toDF("id", "payload")
    Multimodal.resizeBmp(df, "payload", 2, 2).select("resized").head().isNullAt(0) shouldBe true
  }

  test("audio frames: per-frame RMS/ZCR from hand-built bytes, partial tail, non-WAV dropped") {
    // 10 samples, frameSize 4 -> frames of 4, 4, 2 (partial tail).
    // frame 0: 1000, -1000, 1000, -1000  -> 3 sign flips
    // frame 1: 0, 0, 500, 500            -> 0 flips (zeros never flip)
    // frame 2: -2000, 2000               -> 1 flip
    // frame boundaries (s4 vs s5, s8 vs s9... wait s7=500, s8=-2000)
    // never counted: frame 2's flip is within-frame (s8 -> s9).
    val samples = Seq[Short](1000, -1000, 1000, -1000, 0, 0, 500, 500, -2000, 2000)
    val frames = Multimodal.decodeWavPcm16Frames(wavOf(samples), 4).get
    frames.map(f => (f._1, f._2, f._4)).toSeq shouldBe Seq((0, 4, 3), (1, 4, 0), (2, 2, 1))
    def rmsOf(xs: Seq[Short]) =
      math.sqrt(xs.map(s => { val x = s / 32768.0; x * x }).sum / xs.size)
    frames(0)._3 shouldBe rmsOf(samples.slice(0, 4)) +- 1e-15
    frames(2)._3 shouldBe rmsOf(samples.slice(8, 10)) +- 1e-15

    // DataFrame operator: WAV rows explode to frames, non-WAV rows drop
    val df = Seq(
      (1L, wavOf(samples)),
      (2L, "not a wav at all".getBytes("US-ASCII"))).toDF("id", "payload")
    val out = Multimodal.audioFrames(df, "payload", frameSize = 4)
    out.columns.toSeq shouldBe Seq("id", "payload", "frame_id", "n_samples", "rms", "zcr")
    val rows = out.orderBy("id", "frame_id").collect()
    rows.map(_.getAs[Long]("id")).toSeq shouldBe Seq(1L, 1L, 1L)
    rows.map(_.getAs[Int]("zcr")).toSeq shouldBe Seq(3, 0, 1)
  }

  test("audio frames: boundary sign flip is NOT counted across frames") {
    // s3 = 100, s4 = -100: a flip at the 4-sample frame boundary
    val samples = Seq[Short](100, 100, 100, 100, -100, -100, -100, -100)
    val frames = Multimodal.decodeWavPcm16Frames(wavOf(samples), 4).get
    frames.map(_._4).toSeq shouldBe Seq(0, 0)
    // the same pair inside ONE frame does count
    val one = Multimodal.decodeWavPcm16Frames(wavOf(samples), 8).get
    one.map(_._4).toSeq shouldBe Seq(1)
  }

  test("sampleFrames explodes byte-range frames at the stride") {
    val out = Multimodal.sampleFrames(payloads.filter(col("id") === 3L), "payload", stride = 8)
    val frames = out.select("frame_offset", "frame_bytes").orderBy("frame_offset").collect()
    // "another payload here" = 20 bytes -> offsets 0, 8, 16
    frames.map(_.getAs[Int]("frame_offset")).toSeq shouldBe Seq(0, 8, 16)
    new String(frames(0).getAs[Array[Byte]]("frame_bytes")) shouldBe "another "
  }

  // --- perceptual aHash ------------------------------------------------

  /** 8x8 BMP whose pixel grays come from a function of the index. */
  private def bmp8x8(gray: Int => Int): Array[Byte] = {
    val body = new Array[Byte](192)
    for (i <- 0 until 64; c <- 0 until 3) body(3 * i + c) = (gray(i) / 3).toByte
    Multimodal.bmp24Header(8, 8) ++ body
  }

  test("aHash: half-dark half-bright image sets exactly the bright bits") {
    // pixels 0-31 gray 30, 32-63 gray 240 -> mean 135: bits 32..63 set
    val q = Multimodal.aHash64Quarters(bmp8x8(i => if (i < 32) 30 else 240)).get
    q(0) shouldBe 0
    q(1) shouldBe 0
    q(2) shouldBe 0xFFFF
    q(3) shouldBe 0xFFFF
  }

  test("aHash: uniform image has no bit set (strict > mean)") {
    Multimodal.aHash64Quarters(bmp8x8(_ => 120)).get.toSeq shouldBe Seq(0, 0, 0, 0)
  }

  test("aHash: undecodable payload maps to null through withImageAHash") {
    val df = Seq((1L, "not a bmp".getBytes), (2L, bmp8x8(i => i * 4)))
      .toDF("id", "payload")
    val out = Multimodal.withImageAHash(df, "payload")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[scala.collection.Seq[Int]]("ahash"))).toMap
    out(1L) shouldBe None
    out(2L).get.length shouldBe 4
  }

  test("aHash goes through the 8x8 resize: a 16x16 2x-upscale of an 8x8 image hashes identically") {
    val base = bmp8x8(i => (i * 7) % 256)
    // build the 16x16 by duplicating each pixel 2x2 (exact box-average
    // inverse), stride for w=16 is 48, no padding
    val (_, _, rgb) = Multimodal.decodeBmp24Pixels(base).get
    val body = new Array[Byte](3 * 16 * 16)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      // stored BGR: decodeBmp24Pixels returned RGB, re-swap
      body(3 * (y * 16 + x) + c) = rgb(3 * ((y / 2) * 8 + x / 2) + (2 - c))
    val big = Multimodal.bmp24Header(16, 16) ++ body
    Multimodal.aHash64Quarters(big).get.toSeq shouldBe
      Multimodal.aHash64Quarters(base).get.toSeq
  }

  test("aHashPairs finds small perturbations, skips distant images, dedups bands") {
    // img 1 and 2 differ in one pixel's gray; img 3 is the inverse image
    val df = Seq(
      (1L, bmp8x8(i => if (i < 32) 30 else 240)),
      (2L, bmp8x8(i => if (i == 0) 45 else if (i < 32) 30 else 240)),
      (3L, bmp8x8(i => if (i < 32) 240 else 30)))
      .toDF("id", "payload")
    val pairs = Multimodal.aHashPairs(
        Multimodal.withImageAHash(df, "payload"), "id", "ahash", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    pairs.toSeq shouldBe Seq((1L, 2L, 0)) // same bit pattern: mean moved too
  }

  test("audio fingerprint: monotone clip sets all bits, flat none, short clip null") {
    def wavSamples(vs: Seq[Short]): Array[Byte] = {
      val data = vs.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray
      Multimodal.wavPcm16Header(dataBytes = data.length) ++ data
    }
    val up = Multimodal.audioFingerprintQuarters(
      wavSamples((0 until 65).map(_.toShort))).get
    up.toSeq shouldBe Seq(0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    val flat = Multimodal.audioFingerprintQuarters(
      wavSamples(Seq.fill(65)(100.toShort))).get
    flat.toSeq shouldBe Seq(0, 0, 0, 0)
    Multimodal.audioFingerprintQuarters(
      wavSamples((0 until 64).map(_.toShort))) shouldBe None
    Multimodal.audioFingerprintQuarters("not a wav".getBytes) shouldBe None
  }

  test("audio fingerprint pairs: one-sample perturbation flips at most 2 bits") {
    def wavSamples(vs: Seq[Short]): Array[Byte] = {
      val data = vs.flatMap(v => Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).toArray
      Multimodal.wavPcm16Header(dataBytes = data.length) ++ data
    }
    val base = (0 until 65).map(i => ((i * 37) % 200 - 100).toShort)
    val perturbed = base.updated(20, (base(20) + 5).toShort)
    val df = Seq((1L, wavSamples(base)), (2L, wavSamples(perturbed)),
      (3L, wavSamples(base.map(v => (-v).toShort)))) // inverted contour
      .toDF("id", "payload")
    val pairs = Multimodal.aHashPairs(
        Multimodal.withAudioFingerprint(df, "payload"), "id", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs.head._3 should be <= 2
  }

  test("aHashPairs bucket cap skips an over-cap quarter bucket, keeps small pairs") {
    // 300 byte-identical images put all four quarter buckets at 300 —
    // over the 256 default, so the DEFAULT call emits no clique pairs;
    // the distant small pair still pairs. The uncapped opt-in
    // (maxBucketSize = 0) restores the full C(300,2) clique, and an
    // explicit cap ABOVE the bucket (500) equals the uncapped result —
    // the cap never perturbs under-cap buckets.
    val clique = (0L until 300L).map(i => (i, bmp8x8(p => if (p < 32) 30 else 240)))
    val pairDocs = Seq(
      (1000L, bmp8x8(p => if (p < 16) 200 else 20)),
      (1001L, bmp8x8(p => if (p == 0) 210 else if (p < 16) 200 else 20)))
    val df = (clique ++ pairDocs).toDF("id", "payload")
    val hashed = Multimodal.withImageAHash(df, "payload")
    def run(cap: Option[Int]) = cap.fold(
        Multimodal.aHashPairs(hashed, "id", "ahash"))(c =>
        Multimodal.aHashPairs(hashed, "id", "ahash", maxBucketSize = c))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    run(None) shouldBe Set((1000L, 1001L)) // the DEFAULT cap engages at 300
    def runC(c: Int) = run(Some(c))
    val unc = runC(0)
    unc should contain ((1000L, 1001L))
    unc.size shouldBe (300 * 299 / 2 + 1)
    runC(500) shouldBe unc
  }

  test("aHashPairs is partition-count independent") {
    val imgs = (0L until 24L).map(i =>
      (i, bmp8x8(p => if (p < 32) (i % 4).toInt * 3 else 200 + (i % 3).toInt)))
    val df1 = imgs.toDF("id", "payload").repartition(1)
    val df7 = imgs.toDF("id", "payload").repartition(7)
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.aHashPairs(Multimodal.withImageAHash(df, "payload"), "id", "ahash")
        .orderBy("id_a", "id_b").collect().toSeq
    run(df1) shouldBe run(df7)
  }

  test("decodeMp3Frames reads CBR chains: count, rate, bitrate, duration") {
    // 3 frames at 128 kbps / 44100 Hz: frameLen = 144000*128/44100 = 417
    val bytes = Multimodal.encodeMp3Frames(3, bitrateIdx = 9, srIdx = 0)
    bytes.length shouldBe 3 * 417
    val (n, rate, bMin, bMax, ns, dur) = Multimodal.decodeMp3Frames(bytes).get
    n shouldBe 3
    rate shouldBe 44100
    bMin shouldBe 128; bMax shouldBe 128
    ns shouldBe 3L * 1152L
    dur shouldBe (3456.0 / 44100.0) +- 1e-15
  }

  test("decodeMp3Frames: VBR concatenation reports min/max frame bitrate") {
    // two chains at the SAME sample rate, different bitrates, glued:
    // frames are self-delimiting so the walk crosses the seam
    val vbr = Multimodal.encodeMp3Frames(2, bitrateIdx = 5, srIdx = 1) ++ // 64 kbps
      Multimodal.encodeMp3Frames(1, bitrateIdx = 14, srIdx = 1)          // 320 kbps
    val (n, rate, bMin, bMax, _, _) = Multimodal.decodeMp3Frames(vbr).get
    n shouldBe 3
    rate shouldBe 48000
    bMin shouldBe 64; bMax shouldBe 320
  }

  test("decodeMp3Frames: truncated final frame still counts (prefix policy)") {
    val bytes = Multimodal.encodeMp3Frames(2, bitrateIdx = 9, srIdx = 0)
    val cut = bytes.dropRight(100) // second header intact, body cut off
    Multimodal.decodeMp3Frames(cut).map(_._1) shouldBe Some(2)
  }

  test("decodeMp3Frames rejects non-MP3 and stops at a mid-stream rate switch") {
    Multimodal.decodeMp3Frames(null) shouldBe None
    Multimodal.decodeMp3Frames("not audio at all".getBytes) shouldBe None
    // MPEG-2 version bits (not MPEG-1): rejected
    val v2 = Multimodal.encodeMp3Frames(1, 9, 0)
    v2(1) = 0xF3.toByte // version bits 10 = MPEG-2
    Multimodal.decodeMp3Frames(v2) shouldBe None
    // free-format (bitrate idx 0) rejected
    val free = Multimodal.encodeMp3Frames(1, 9, 0)
    free(2) = 0x00.toByte
    Multimodal.decodeMp3Frames(free) shouldBe None
    // a sample-rate switch mid-stream ends the walk at the seam
    val mixed = Multimodal.encodeMp3Frames(2, 9, 0) ++
      Multimodal.encodeMp3Frames(2, 9, 2)
    Multimodal.decodeMp3Frames(mixed).map(r => (r._1, r._2)) shouldBe Some((2, 44100))
  }

  test("withMp3Meta decodes planted chains in-plan, nulls the rest") {
    val rows = Seq(
      (1L, Multimodal.encodeMp3Frames(2, 9, 0)),
      (2L, "definitely not an mp3 payload".getBytes))
    val out = Multimodal.withMp3Meta(rows.toDF("id", "payload"), "payload")
      .select(col("id"), col("mp3_meta.n_frames"), col("mp3_meta.sample_rate"))
      .orderBy("id").collect()
    out(0) shouldBe Row(1L, 2, 44100)
    out(1).isNullAt(1) shouldBe true
  }

  // ---- IMA ADPCM: real compressed-audio sample decode -----------------

  /** Independent reference decode of a mono IMA-ADPCM WAV, typed from
    * the public spec separately from the library implementation, so a
    * transcription slip in either tables or nibble walk fails here. */
  private def refAdpcmDecode(bytes: Array[Byte]): Seq[Int] = {
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
      2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
      9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val adj = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    def u8(i: Int) = bytes(i) & 0xFF
    // locate fmt blockAlign + data by the same public RIFF layout
    var i = 12; var blockAlign = -1; var dOff = -1; var dLen = 0
    while (i + 8 <= bytes.length && (blockAlign < 0 || dOff < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = u8(i + 4) | (u8(i + 5) << 8) | (u8(i + 6) << 16) | (u8(i + 7) << 24)
      if (id == "fmt ") blockAlign = u8(i + 8 + 12) | (u8(i + 8 + 13) << 8)
      else if (id == "data") { dOff = i + 8; dLen = math.min(sz, bytes.length - i - 8) }
      i += 8 + sz + (sz & 1)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blk = dOff
    while (blk + 4 <= dOff + dLen) {
      var pred = ((u8(blk) | (u8(blk + 1) << 8)).toShort).toInt
      var idx = u8(blk + 2)
      out += pred
      var b = blk + 4
      while (b < math.min(blk + blockAlign, dOff + dLen)) {
        for (nib <- Seq(u8(b) & 0xF, (u8(b) >> 4) & 0xF)) {
          val st = step(idx)
          var diff = st >> 3
          if ((nib & 1) != 0) diff += st >> 2
          if ((nib & 2) != 0) diff += st >> 1
          if ((nib & 4) != 0) diff += st
          pred = math.max(-32768, math.min(32767,
            if ((nib & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + adj(nib)))
          out += pred
        }
        b += 1
      }
      blk += blockAlign
    }
    out.toSeq
  }

  private def statsOf(dec: Seq[Int]): (Long, Double, Double, Double) = {
    val s = dec.map(_ / 32768.0)
    (s.size.toLong, s.sum / s.size,
      math.sqrt(s.map(x => x * x).sum / s.size), s.map(math.abs).max)
  }

  test("ADPCM decode equals the independent reference decoder, multi-block included") {
    // pseudo-random PCM spanning 3 blocks (perBlock = 65 at blockAlign 36)
    val pcm = Array.tabulate[Short](180)(j => (((j * 48271 + 11) % 32768) - 16384).toShort)
    val wav = Multimodal.imaAdpcmWav(pcm, blockAlign = 36)
    val got = Multimodal.decodeWavImaAdpcm(wav).get
    val want = statsOf(refAdpcmDecode(wav))
    got._1 shouldBe want._1
    got._2 shouldBe want._2 +- 1e-12
    got._3 shouldBe want._3 +- 1e-12
    got._4 shouldBe want._4
  }

  test("ADPCM round-trip tracks the original signal (4:1 compression, bounded error)") {
    // a smooth signal the adaptive quantizer follows closely
    val pcm = Array.tabulate[Short](650)(j =>
      (8000.0 * math.sin(j / 9.0)).toShort)
    val wav = Multimodal.imaAdpcmWav(pcm, blockAlign = 36)
    val dec = refAdpcmDecode(wav)
    val err = pcm.indices.map(j => math.abs(dec(j) - pcm(j)) / 32768.0)
    (err.sum / err.size) should be < 0.01 // mean abs error < 1% full scale
    // and it IS 4:1-ish: 650 samples of PCM16 = 1300 bytes vs ~360 of data
    wav.length should be < 500
  }

  test("ADPCM truncation decodes the prefix; non-ADPCM payloads are None") {
    val pcm = Array.tabulate[Short](130)(j => ((j * 997 % 8192) - 4096).toShort)
    val wav = Multimodal.imaAdpcmWav(pcm, blockAlign = 36)
    val cut = wav.take(wav.length - 10)
    val full = Multimodal.decodeWavImaAdpcm(wav).get
    val part = Multimodal.decodeWavImaAdpcm(cut).get
    part._1 should be < full._1
    part._1 should be > 0L
    // format gates: PCM-16 is not ADPCM and vice versa
    val pcmWav = Multimodal.wavPcm16Header(8) ++ Array[Byte](1, 0, 2, 0, 3, 0, 4, 0)
    Multimodal.decodeWavImaAdpcm(pcmWav) shouldBe None
    Multimodal.decodeWavPcm16(wav) shouldBe None
  }

  test("withAudioStats decodes BOTH PCM-16 and ADPCM payloads in one frame; m9 goldens hold") {
    val pcm = Array.tabulate[Short](64)(j => ((j * 500 % 16384) - 8192).toShort)
    val rows = Seq(
      (1L, Multimodal.wavPcm16Header(8) ++ Array[Byte](0, 16, 0, 16, 0, 16, 0, 16)),
      (2L, Multimodal.imaAdpcmWav(pcm, blockAlign = 36)),
      (3L, "not audio".getBytes))
    val out = Multimodal.withAudioStats(rows.toDF("id", "payload"), "payload")
      .select(col("id"), col("audio_stats.n_samples"))
      .orderBy("id").collect()
    out(0).getLong(1) shouldBe 4L
    out(1).getLong(1) shouldBe 65L
    out(2).isNullAt(1) shouldBe true
    // the m9 oracle's golden constants ARE what the decoder produces
    val goldens = Seq(
      (0, -0.045437, 0.277715, 0.460754),
      (1, -0.011611, 0.283089, 0.528046),
      (2, -0.022701, 0.288659, 0.57196),
      (3, -0.026201, 0.271879, 0.533844))
    goldens.foreach { case (v, m, r, p) =>
      val sig = Array.tabulate[Short](64)(j =>
        (((j + 1) * (2 * v + 3) * 997) % 32768 - 16384).toShort)
      val (n, mean, rms, peak) =
        Multimodal.decodeWavImaAdpcm(Multimodal.imaAdpcmWav(sig, blockAlign = 36)).get
      n shouldBe 65L
      BigDecimal(mean + 5e-10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble shouldBe m
      BigDecimal(rms + 5e-10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble shouldBe r
      BigDecimal(peak + 5e-10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble shouldBe p
    }
  }

  test("flipBmp mirrors exactly; flip of flip is the identity; crop selects exact bytes") {
    // 2x2 image with distinct pixels. The BMP family here works in
    // STORED row order throughout (decodeBmp24Pixels doc), so row 0
    // below is decoded row 0. Pixels per stored row: BGR triples.
    val body = Array[Byte](
      1, 2, 3, 4, 5, 6, 0, 0, // stored row 0: px0=BGR(1,2,3), px1=BGR(4,5,6); stride pad
      7, 8, 9, 10, 11, 12, 0, 0) // stored row 1
    val bmp = Multimodal.bmp24Header(2, 2) ++ body
    val df = Seq((1L, bmp), (2L, "junk".getBytes)).toDF("id", "payload")
    val flipped = Multimodal.flipBmp(df, "payload")
    val fRows = flipped.orderBy("id").collect()
    fRows(1).isNullAt(2) shouldBe true // non-BMP nulls
    val fb = fRows(0).getAs[Array[Byte]]("flipped")
    val (w, h, rgb) = Multimodal.decodeBmp24Pixels(fb).get
    (w, h) shouldBe ((2, 2))
    // stored row 0 was [RGB(3,2,1), RGB(6,5,4)]; the mirror swaps columns
    rgb.take(6).map(_.toInt) shouldBe Array(6, 5, 4, 3, 2, 1)
    // flip twice = identity (payload bytes round-trip exactly)
    val twice = Multimodal.flipBmp(
      flipped.drop("payload").withColumnRenamed("flipped", "payload"), "payload")
      .orderBy("id").collect()(0).getAs[Array[Byte]]("flipped")
    twice shouldBe bmp
    // crop 1x1 at (1, 0): stored row 0, col 1 = RGB(6,5,4)
    val crop = Multimodal.cropBmp(df, "payload", 1, 0, 1, 1).orderBy("id").collect()
    val (cw, chh, cpx) = Multimodal.decodeBmp24Pixels(crop(0).getAs[Array[Byte]]("cropped")).get
    (cw, chh) shouldBe ((1, 1))
    cpx.map(_.toInt) shouldBe Array(6, 5, 4)
    // window outside the image nulls out, never partially crops
    Multimodal.cropBmp(df, "payload", 1, 1, 2, 2).orderBy("id")
      .collect()(0).isNullAt(2) shouldBe true
  }

  test("decimateWav keeps every factor-th sample, rewrites the rate, nulls non-PCM") {
    // 8 samples: 100, 200, ..., 800 (LE16)
    val data = (1 to 8).flatMap { i =>
      val v = i * 100; Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    }.toArray
    val wav = Multimodal.wavPcm16Header(16, sampleRate = 8000) ++ data
    val df = Seq((1L, wav), (2L, "nope".getBytes)).toDF("id", "payload")
    val out = Multimodal.decimateWav(df, "payload", factor = 3).orderBy("id").collect()
    out(1).isNullAt(2) shouldBe true
    val dec = out(0).getAs[Array[Byte]]("decimated")
    Multimodal.wavSampleRate(dec) shouldBe Some(2666) // 8000 / 3
    // samples 0, 3, 6 -> 100, 400, 700
    val (n, mean, _, peak) = Multimodal.decodeWavPcm16(dec).get
    n shouldBe 3L
    mean shouldBe ((100 + 400 + 700) / 3.0 / 32768.0) +- 1e-12
    peak shouldBe (700 / 32768.0) +- 1e-15
    // junk chunk before fmt still parses the rate
    val junk = wav.take(12) ++ "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes ++ wav.drop(12)
    Multimodal.wavSampleRate(junk) shouldBe Some(8000)
  }

  // ---- AVI video: container parse + real frame decode ----

  private def rgbFrame(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(i => f(i).toByte)

  private def channelMeans(rgb: Array[Byte]): (Double, Double, Double) = {
    val n = rgb.length / 3
    def mean(c: Int) = (0 until n).map(p => rgb(3 * p + c) & 0xFF).sum.toDouble / n
    (mean(0), mean(1), mean(2))
  }

  test("AVI: encodeAvi/aviInfo round-trips the header (DIB and MJPG handlers)") {
    val frames = Seq(rgbFrame(6, 4)(_ % 251), rgbFrame(6, 4)(i => (i * 7) % 251))
    val dib = Multimodal.encodeAvi(6, 4, frames, usecPerFrame = 33367)
    Multimodal.aviInfo(dib) shouldBe Some((33367, 2, 6, 4, "DIB "))
    val mjpg = Multimodal.encodeAvi(6, 4, frames, usecPerFrame = 40000, mjpeg = true)
    Multimodal.aviInfo(mjpg) shouldBe Some((40000, 2, 6, 4, "MJPG"))
    // header parse is O(header): a junk tail after the valid lists is ignored
    Multimodal.aviInfo(dib ++ Array.fill[Byte](1000)(0x55)) shouldBe Some((33367, 2, 6, 4, "DIB "))
  }

  test("AVI: uncompressed DIB frames decode to exact per-channel means (BGR + bottom-up honored)") {
    // w=5 forces a padded stride (15 -> 16) so the stride math is exercised
    val f0 = rgbFrame(5, 3)(i => i % 3 match { case 0 => 100; case 1 => 150; case _ => 200 })
    val f1 = rgbFrame(5, 3)(i => i) // distinct per-channel means
    val avi = Multimodal.encodeAvi(5, 3, Seq(f0, f1), usecPerFrame = 40000)
    val frames = Multimodal.decodeAviFrames(avi).get
    frames.length shouldBe 2
    frames(0)._1 shouldBe 0
    frames(0)._2 shouldBe 15L
    frames(0)._3 shouldBe 100.0 +- 1e-12 // mean_r
    frames(0)._4 shouldBe 150.0 +- 1e-12
    frames(0)._5 shouldBe 200.0 +- 1e-12
    val (er, eg, eb) = channelMeans(f1)
    frames(1)._3 shouldBe er +- 1e-12
    frames(1)._4 shouldBe eg +- 1e-12
    frames(1)._5 shouldBe eb +- 1e-12
  }

  test("AVI: MJPG frames decode through the real JPEG path within lossy tolerance") {
    // smooth frames compress politely; per-channel means survive within a few counts
    val f0 = rgbFrame(16, 16)(_ => 128)
    val f1 = rgbFrame(16, 16)(i => 60 + (i / 48))
    val avi = Multimodal.encodeAvi(16, 16, Seq(f0, f1), mjpeg = true)
    val frames = Multimodal.decodeAviFrames(avi).get
    frames.length shouldBe 2
    frames(0)._2 shouldBe 256L
    frames(0)._3 shouldBe 128.0 +- 3.0
    val (er, eg, eb) = channelMeans(f1)
    frames(1)._3 shouldBe er +- 4.0
    frames(1)._4 shouldBe eg +- 4.0
    frames(1)._5 shouldBe eb +- 4.0
  }

  test("AVI: corrupt payloads fail whole (strict policy), non-AVI None, maxFrames bounds fan-out") {
    val frames = Seq(rgbFrame(4, 2)(_ + 1), rgbFrame(4, 2)(_ + 9), rgbFrame(4, 2)(_ + 17))
    val avi = Multimodal.encodeAvi(4, 2, frames)
    Multimodal.decodeAviFrames("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)) shouldBe None
    Multimodal.decodeAviFrames(null) shouldBe None
    // truncating the last frame's raster corrupts its chunk -> whole payload None
    Multimodal.decodeAviFrames(avi.take(avi.length - 5)) shouldBe None
    // maxFrames caps the explode without failing the decode
    Multimodal.decodeAviFrames(avi, maxFrames = 2).get.length shouldBe 2
    // forged giant dimensions are bomb-gated before any pixel walk
    val bomb = avi.clone()
    // avih width/height at offsets 64/68 (RIFF 12 + LIST hdr 12 + avih hdr 8 + 32)
    val wOff = 64
    bomb(wOff) = 0; bomb(wOff + 1) = 0; bomb(wOff + 2) = 0; bomb(wOff + 3) = 0x40
    Multimodal.decodeAviFrames(bomb) shouldBe None
  }

  test("AVI: withVideoMeta and videoFrames run in-plan; non-AVI rows null/drop") {
    val avi = Multimodal.encodeAvi(4, 2, Seq(rgbFrame(4, 2)(_ => 50), rgbFrame(4, 2)(_ => 250)),
      usecPerFrame = 20000)
    val rows = Seq((1L, avi), (2L, "not a video".getBytes))
    val meta = Multimodal.withVideoMeta(rows.toDF("id", "payload"), "payload")
      .select(col("id"), col("video_meta.n_frames"), col("video_meta.duration_ms"),
        col("video_meta.handler"))
      .orderBy("id").collect()
    meta(0).getInt(1) shouldBe 2
    meta(0).getDouble(2) shouldBe 40.0
    meta(0).getString(3) shouldBe "DIB "
    meta(1).isNullAt(1) shouldBe true
    val fr = Multimodal.videoFrames(rows.toDF("id", "payload"), "payload")
      .select(col("id"), col("frame_id"), col("mean_r"))
      .orderBy("id", "frame_id").collect()
    fr.length shouldBe 2 // non-AVI row dropped
    fr(0).getDouble(2) shouldBe 50.0
    fr(1).getDouble(2) shouldBe 250.0
  }

  test("AVI: aviDibPayload plants text bytes as rasters the decoder reads back (m10 contract)") {
    val text = (0 until 48).map(i => ('A' + (i * 11) % 26).toChar).mkString
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val planted = df.withColumn("payload",
      Multimodal.aviDibPayload(col("text"), w = 4, h = 2, nFrames = 2))
    val got = Multimodal.videoFrames(planted, "payload")
      .select(col("frame_id"), col("n_pixels"), col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy("frame_id").collect()
    got.length shouldBe 2
    def expMean(f: Int, c: Int): Double = // DIB raster: text byte i is channel BGR[i%3]
      (0 until 24).filter(_ % 3 == c).map(i => text(f * 24 + i).toInt).sum / 8.0
    (0 until 2).foreach { f =>
      got(f).getLong(1) shouldBe 8L
      got(f).getDouble(2) shouldBe expMean(f, 2) +- 1e-12 // R is BGR index 2
      got(f).getDouble(3) shouldBe expMean(f, 1) +- 1e-12
      got(f).getDouble(4) shouldBe expMean(f, 0) +- 1e-12
    }
    // short text pads with 'x' (120) — both frames decode, second is all-'x'
    val short = Seq((8L, "ab")).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.aviDibPayload(col("text"), 4, 2, 2))
    val g2 = Multimodal.videoFrames(short, "payload")
      .select(col("frame_id"), col("mean_g")).orderBy("frame_id").collect()
    g2.length shouldBe 2
    g2(1).getDouble(1) shouldBe 120.0 // 'x'
  }

  test("gif encode/decode roundtrips and rejects non-GIF bytes") {
    val bytes = Multimodal.encodeGif(320, 200, nFrames = 3, gctBits = 2, delayCs = 7)
    val Some((v, w, h, gct, nf, ne, dur)) = Multimodal.decodeGifMeta(bytes)
    v shouldBe "GIF89a"
    w shouldBe 320; h shouldBe 200
    gct shouldBe 4 // 2^gctBits colors
    nf shouldBe 3
    ne shouldBe 3 // one GCE per frame
    dur shouldBe 21L // 3 frames x 7 cs
    // zero frames: a bare header + trailer still parses
    val empty = Multimodal.encodeGif(1, 1, 0, 1, 0)
    Multimodal.decodeGifMeta(empty).get._5 shouldBe 0
    // rejections: bad signature, truncation mid-stream, null
    Multimodal.decodeGifMeta("NOTAGIF89a!!!!".getBytes) shouldBe None
    Multimodal.decodeGifMeta(bytes.dropRight(2)) shouldBe None // lost trailer
    Multimodal.decodeGifMeta(null) shouldBe None
    an[IllegalArgumentException] should be thrownBy
      Multimodal.encodeGif(1, 1, 1, gctBits = 9, delayCs = 0)
    // the mapPartitions wrapper nulls the struct for junk payloads
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.withGifMeta(df.repartition(2), "payload")
      .select(col("doc_id"), col("gif_meta")).orderBy("doc_id").collect()
    rows(0).getStruct(1).getInt(4) shouldBe 3 // n_frames
    rows(1).isNullAt(1) shouldBe true
  }

  test("GIF LZW round-trips across width growth, KwKwK, and table resets") {
    val rnd = new scala.util.Random(7)
    for (minCode <- Seq(2, 3, 5, 8); n <- Seq(0, 1, 7, 300, 20000)) {
      val alphabet = 1 << minCode
      val px = Array.fill(n)((rnd.nextInt(alphabet)).toByte)
      val enc = Multimodal.lzwEncode(px, minCode)
      withClue(s"minCode=$minCode n=$n: ") {
        Multimodal.lzwDecode(enc, minCode, n).get.toSeq shouldBe px.toSeq
      }
    }
    // KwKwK: aaa...a forces code == next immediately
    val runs = Array.fill(500)(1.toByte)
    Multimodal.lzwDecode(Multimodal.lzwEncode(runs, 2), 2, 500).get.toSeq shouldBe runs.toSeq
    // highly repetitive long input crosses the 4096-entry reset
    val rep = Array.tabulate(60000)(i => ((i / 3) % 4).toByte)
    Multimodal.lzwDecode(Multimodal.lzwEncode(rep, 2), 2, 60000).get.toSeq shouldBe rep.toSeq
    // malformed: truncated stream, garbage code stream
    Multimodal.lzwDecode(Array[Byte](), 2, 10) shouldBe None
    Multimodal.lzwDecode(Array.fill(8)(0xFF.toByte), 2, 1000) should
      (be(None) or not be None) // must not throw; strictness checked below
  }

  test("decodeGifFrames: planted per-frame pixel means are closed-form; corrupt GIFs are None") {
    // frame f pixel k = (f + k) mod m; palette i = (i, 7i, 13i)
    val (w, h, nf, bits) = (20, 9, 3, 3)
    val m = 1 << bits
    val bytes = Multimodal.encodeGif(w, h, nf, bits, delayCs = 2)
    val frames = Multimodal.decodeGifFrames(bytes).get
    frames.length shouldBe nf
    val n = w * h
    for (f <- 0 until nf) {
      val cnt = Array.tabulate(m)(j =>
        n / m + (if (((j - f) % m + m) % m < n % m) 1 else 0))
      val er = (0 until m).map(j => cnt(j).toDouble * j).sum / n
      val eg = (0 until m).map(j => cnt(j).toDouble * ((j * 7) % 256)).sum / n
      val eb = (0 until m).map(j => cnt(j).toDouble * ((j * 13) % 256)).sum / n
      val (fid, np, mr, mg, mb) = frames(f)
      fid shouldBe f
      np shouldBe n.toLong
      mr shouldBe er +- 1e-9; mg shouldBe eg +- 1e-9; mb shouldBe eb +- 1e-9
    }
    // corrupt: truncating the pixel stream must fail the WHOLE payload
    Multimodal.decodeGifFrames(bytes.dropRight(12)) shouldBe None
    Multimodal.decodeGifFrames("junk".getBytes) shouldBe None
    Multimodal.decodeGifFrames(null) shouldBe None
    // DataFrame wrapper: per-frame rows, corrupt payloads dropped
    val df = Seq((1L, bytes), (2L, Array[Byte](9, 9))).toDF("doc_id", "payload")
    val got = Multimodal.gifFrames(df.repartition(2), "payload")
      .select(col("doc_id"), col("frame_id"), col("n_pixels"))
      .orderBy("doc_id", "frame_id").collect()
    got.map(r => (r.getLong(0), r.getInt(1))).toSeq shouldBe
      (0 until nf).map(f => (1L, f))
    all(got.map(_.getLong(2))) shouldBe n.toLong
  }

  test("otsuOfBmp: bimodal image splits at the smallest optimal t, constants drop") {
    import org.apache.spark.sql.Row
    // 4x4 BMP: 8 dark pixels (10,10,10), 8 bright (200,200,200)
    val dark = Array.fill(8 * 3)(10.toByte)
    val bright = Array.fill(8 * 3)(200.toByte)
    val bi = Multimodal.bmp24Header(4, 4) ++ dark ++ bright
    val r = Multimodal.otsuOfBmp(bi).get
    r.getLong(0) shouldBe 16L                        // n_pixels
    r.getInt(1) shouldBe 10                          // smallest optimal t
    r.getLong(2) shouldBe 8L                         // n_below
    r.getDouble(3) shouldBe 10.0 +- 1e-12            // mean_below
    r.getDouble(4) shouldBe 200.0 +- 1e-12           // mean_above
    r.getDouble(5) shouldBe (0.5 * 0.5 * 190.0 * 190.0) +- 1e-9
    // constant image: no t separates two classes
    val const = Multimodal.bmp24Header(4, 4) ++ Array.fill(48)(55.toByte)
    Multimodal.otsuOfBmp(const) shouldBe None
    // garbage payload
    Multimodal.otsuOfBmp("nope".getBytes) shouldBe None
    // channel-order invariance: (0, 15, 30) -> integer luma 15
    val px = Array[Byte](0, 15, 30) ++ Array.fill(45)(90.toByte)
    val mixed = Multimodal.bmp24Header(4, 4) ++ px
    val rm = Multimodal.otsuOfBmp(mixed).get
    rm.getLong(2) shouldBe 1L       // the single luma-15 pixel below t
    rm.getDouble(3) shouldBe 15.0 +- 1e-12
  }

  test("withOtsuStats: null struct for undecodable payloads, stats ride the row") {
    val good = Multimodal.bmp24Header(4, 4) ++
      Array.fill(24)(10.toByte) ++ Array.fill(24)(200.toByte)
    val df = Seq((1L, good), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = Multimodal.withOtsuStats(df.repartition(2), "payload")
      .orderBy("id").collect()
    out(0).getAs[org.apache.spark.sql.Row]("otsu_stats").getInt(1) shouldBe 10
    out(1).isNullAt(out(1).fieldIndex("otsu_stats")) shouldBe true
  }
}
