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

  test("decodeStub recognizes jpeg/png magic bytes") {
    Multimodal.decodeStub(Array(0xFF.toByte, 1, 2))._1 shouldBe "jpeg-ish"
    Multimodal.decodeStub(Array(0x89.toByte, 1, 2))._1 shouldBe "png-ish"
    Multimodal.decodeStub(Array[Byte]())._1 shouldBe "empty"
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

  test("sampleFrames explodes byte-range frames at the stride") {
    val out = Multimodal.sampleFrames(payloads.filter(col("id") === 3L), "payload", stride = 8)
    val frames = out.select("frame_offset", "frame_bytes").orderBy("frame_offset").collect()
    // "another payload here" = 20 bytes -> offsets 0, 8, 16
    frames.map(_.getAs[Int]("frame_offset")).toSeq shouldBe Seq(0, 8, 16)
    new String(frames(0).getAs[Array[Byte]]("frame_bytes")) shouldBe "another "
  }
}
