package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** FLAC codec: round-trip fidelity across every subframe type the
  * fixture encoder emits, decode of hand-built streams for the paths the
  * encoder never takes (stereo decorrelation, escape partitions, wasted
  * bits would go here as they land), and the strict corrupt policy —
  * a checksummed format decodes fully or not at all. */
class FlacSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundTrip(samples: Array[Int], blockSize: Int = 64,
                        types: Seq[String] = Seq("auto")): Array[Int] = {
    val bytes = Multimodal.flacEncode(samples, blockSize = blockSize, types = types)
    val out = Multimodal.decodeFlacSamples(bytes)
    out should not be empty
    val (rate, ch, bps, dec) = out.get
    rate shouldBe 8000
    ch shouldBe 1
    bps shouldBe 16
    dec
  }

  test("round-trip: constant / verbatim / fixed0-4 / lpc subframes are lossless") {
    val ramp = Array.tabulate(256)(j => j * 5 - 640)          // linear
    val noisy = Array.tabulate(256)(j => ((j * 7919) % 4001) - 2000) // incompressible
    val quad = Array.tabulate(256)(j => (j * j) / 8 - 4000)   // quadratic
    roundTrip(Array.fill(128)(1234), types = Seq("constant")) shouldBe Array.fill(128)(1234)
    roundTrip(noisy, types = Seq("verbatim")) shouldBe noisy
    roundTrip(noisy, types = Seq("fixed0")) shouldBe noisy
    roundTrip(ramp, types = Seq("fixed1")) shouldBe ramp
    roundTrip(quad, types = Seq("fixed2")) shouldBe quad
    roundTrip(quad, types = Seq("fixed3")) shouldBe quad
    roundTrip(quad, types = Seq("fixed4")) shouldBe quad
    roundTrip(ramp, types = Seq("lpc")) shouldBe ramp
    // mixed plan, multiple frames: each block takes the next type
    val mixed = Array.fill(64)(-5) ++ noisy.take(64) ++ ramp.take(64) ++ quad.take(64)
    roundTrip(mixed, types = Seq("constant", "verbatim", "fixed2", "lpc")) shouldBe mixed
  }

  test("round-trip: extreme 16-bit values, a partial final block, empty input") {
    val edges = Array(-32768, 32767, 0, -1, 1, -32768, 32767, -32768,
      32767, 0, 0, 0, -32768, 32767, -1, 1, 7, -7, 100, -100)
    roundTrip(edges, types = Seq("verbatim")) shouldBe edges
    // 100 samples at blockSize 64: a full block then a 36-sample tail
    val partial = Array.tabulate(100)(j => j * 3 - 150)
    roundTrip(partial, types = Seq("fixed1")) shouldBe partial
    roundTrip(Array.emptyIntArray) shouldBe Array.emptyIntArray
  }

  test("the auto policy picks constant for flat blocks and stays lossless") {
    val flatThenRamp = Array.fill(64)(42) ++ Array.tabulate(64)(j => j * 9 - 288)
    roundTrip(flatThenRamp) shouldBe flatThenRamp
  }

  test("escape partitions: residuals too wide for a Rice fit still round-trip") {
    // alternating extremes make fixed2 residuals enormous -> the encoder
    // escapes to raw-width coding, the decoder reads it back
    val wild = Array.tabulate(64)(j => if (j % 2 == 0) -30000 else 30000)
    roundTrip(wild, types = Seq("fixed2")) shouldBe wild
  }

  test("decodeFlacPcm folds the same normalized stats as the PCM contract") {
    val samples = Array.tabulate(128)(j => ((j * 251) % 4096) - 2048)
    val bytes = Multimodal.flacEncode(samples, blockSize = 64)
    val Some((n, mean, rms, peak)) = Multimodal.decodeFlacPcm(bytes)
    n shouldBe 128L
    val norm = samples.map(_ / 32768.0)
    mean shouldBe (norm.sum / 128) +- 1e-12
    rms shouldBe math.sqrt(norm.map(s => s * s).sum / 128) +- 1e-12
    peak shouldBe norm.map(math.abs).max +- 1e-15
  }

  test("strict corrupt policy: bit flips anywhere fail the whole payload") {
    val samples = Array.tabulate(128)(j => j * 3 - 192)
    val good = Multimodal.flacEncode(samples, blockSize = 64)
    Multimodal.decodeFlacSamples(good) should not be empty
    // flip one bit in: the magic, the STREAMINFO total-samples field
    // (cross-checked against the actual decode; rate/blocksize bounds
    // carry no checksum in the format itself, so corruption there is
    // undetectable by ANY decoder), a frame header, a frame body, and
    // the final CRC byte — every one must invalidate the payload
    // (CRC-8/CRC-16 or structure catches it)
    for (pos <- Seq(0, 25, 4 + 4 + 34 + 1, good.length / 2, good.length - 1)) {
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ 0x40).toByte
      withClue(s"flipped byte $pos: ") {
        Multimodal.decodeFlacSamples(bad) shouldBe empty
      }
    }
    // truncation: a checksummed stream has no honest prefix read
    Multimodal.decodeFlacSamples(good.take(good.length - 3)) shouldBe empty
    Multimodal.decodeFlacSamples(good.take(20)) shouldBe empty
    // non-FLAC bytes
    Multimodal.decodeFlacSamples("not a flac stream at all".getBytes) shouldBe empty
    Multimodal.decodeFlacSamples(Array.emptyByteArray) shouldBe empty
    Multimodal.decodeFlacSamples(null) shouldBe empty
  }

  test("withAudioStats decodes FLAC payloads alongside WAV/ADPCM") {
    val s1 = Array.tabulate(64)(j => j * 100 - 3200)
    val df = Seq((1L, Multimodal.flacEncode(s1, blockSize = 64)),
      (2L, "junk".getBytes.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val rows = Multimodal.withAudioStats(df, "payload")
      .select(col("id"), col("audio_stats.n_samples"))
      .orderBy("id").collect()
    rows(0).getLong(1) shouldBe 64L
    rows(1).isNullAt(1) shouldBe true
  }

  test("the m16 planted signal round-trips through the in-plan payload column") {
    val df = Seq(7L, 123L).toDF("doc_id")
      .withColumn("payload", Multimodal.flacPayload(col("doc_id")))
    val rows = Multimodal.withAudioStats(df, "payload")
      .select(col("doc_id"), col("audio_stats.n_samples"), col("audio_stats.mean"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      r.getLong(1) shouldBe 256L
      val d = r.getLong(0)
      val sig = Multimodal.flacSignal(d)
      val expMean = sig.map(_ / 32768.0).sum / 256
      r.getDouble(2) shouldBe expMean +- 1e-12
    }
  }

  test("bomb gate is interleaved: 8-channel streams are budgeted at samples x channels") {
    // sanity: the wide-stream fixture itself is a valid FLAC the decoder
    // accepts — so the rejections below are the gate, not a bad stream
    val ok = Multimodal.decodeFlacSamples(
      Multimodal.flacEncodeConstantFrames(7, channels = 8, blockSize = 4096,
        nFrames = 2, declaredTotal = 8192))
    ok should not be empty
    val (_, ch, _, dec) = ok.get
    ch shouldBe 8
    dec.length shouldBe 8192 * 8
    all(dec) shouldBe 7

    // declared gate: total/channel far under 2^24, but x8 channels
    // crosses the interleaved budget -> rejected at STREAMINFO
    Multimodal.decodeFlacSamples(
      Multimodal.flacEncodeConstantFrames(7, channels = 8, blockSize = 4096,
        nFrames = 0, declaredTotal = (1L << 21) + 1)) shouldBe empty

    // accumulation gate: unknown total (streamed capture), 33 frames of
    // 65536 x 8ch = 2^24 + 2^19 interleaved from a ~2 KB payload. The
    // per-channel count (2.2M) is far under 2^24 — a per-channel gate
    // would decode ~1 GiB of block arrays; the interleaved gate rejects.
    Multimodal.decodeFlacSamples(
      Multimodal.flacEncodeConstantFrames(7, channels = 8, blockSize = 65536,
        nFrames = 33, declaredTotal = 0L)) shouldBe empty

    // same shape one frame short stays exactly at the 2^24 budget -> ok
    val atCap = Multimodal.decodeFlacSamples(
      Multimodal.flacEncodeConstantFrames(7, channels = 8, blockSize = 65536,
        nFrames = 32, declaredTotal = 0L))
    atCap should not be empty
    atCap.get._4.length shouldBe (1 << 24)
  }

  test("decoder handles a hand-built left-side stereo frame") {
    // build a 2-channel left/side frame by hand: the encoder is mono-only,
    // so this pins the decorrelation path the format defines
    val left = Array.tabulate(32)(j => j * 10 - 160)
    val right = Array.tabulate(32)(j => j * 3 - 48)
    val bytes = Multimodal.flacEncodeStereoLeftSide(left, right)
    val out = Multimodal.decodeFlacSamples(bytes)
    out should not be empty
    val (_, ch, _, dec) = out.get
    ch shouldBe 2
    // interleaved L R L R ...
    (0 until 32).foreach { i =>
      dec(2 * i) shouldBe left(i)
      dec(2 * i + 1) shouldBe right(i)
    }
  }
}
