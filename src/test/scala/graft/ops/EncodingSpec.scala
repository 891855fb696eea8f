package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EncodingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("targetEncode shrinks toward the global mean by pseudo-count weight") {
    // cat a: 4 rows mean 10; cat b: 1 row mean 100 -> global mean 28
    val df = Seq(("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 10.0), ("b", 100.0))
      .toDF("c", "t")
    val got = Encoding.targetEncode(df, "c", "t", k = 1.0)
      .orderBy("category")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got(0)._1 shouldBe "a"
    got(0)._3 shouldBe 10.0 +- 1e-12
    got(0)._4 shouldBe (40.0 + 1 * 28.0) / 5.0 +- 1e-12 // pulled up slightly
    got(1)._1 shouldBe "b"
    got(1)._4 shouldBe (100.0 + 1 * 28.0) / 2.0 +- 1e-12 // rare cat pulled hard
    // k = 0 degenerates to the raw mean
    Encoding.targetEncode(df, "c", "t", k = 0.0)
      .filter($"category" === "b").head().getDouble(3) shouldBe 100.0 +- 1e-12
    // nulls in either column are excluded
    val withNulls = df.union(Seq((null.asInstanceOf[String], 5.0)).toDF("c", "t"))
    Encoding.targetEncode(withNulls, "c", "t").count() shouldBe 2L
  }

  test("woeEncode matches the smoothed odds closed form; IV terms sum sanely") {
    // a: 8 good / 2 bad; b: 2 good / 8 bad (strong separator)
    val df = (Seq.fill(8)(("a", 1)) ++ Seq.fill(2)(("a", 0)) ++
      Seq.fill(2)(("b", 1)) ++ Seq.fill(8)(("b", 0))).toDF("c", "y")
    val got = Encoding.woeEncode(df, "c", "y", alpha = 0.5)
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    def woe(g: Long, b: Long): Double =
      math.log(((g + 0.5) / 11.0) / ((b + 0.5) / 11.0))
    got(0) match { case (c, g, b, w, iv) =>
      c shouldBe "a"; g shouldBe 8L; b shouldBe 2L
      w shouldBe woe(8, 2) +- 1e-12
      iv shouldBe ((8.5 / 11.0) - (2.5 / 11.0)) * woe(8, 2) +- 1e-12
    }
    got(1)._4 shouldBe woe(2, 8) +- 1e-12
    // symmetric fixture: WOEs mirror, IV terms equal and positive
    got(0)._4 shouldBe -got(1)._4 +- 1e-12
    got(0)._5 shouldBe got(1)._5 +- 1e-12
    got(0)._5 should be > 0.0
  }

  test("quantileBin cuts quartiles of 1..8 exactly (percentile_cont edges)") {
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val rows = Encoding.quantileBin(df.repartition(3), "v", k = 4).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    rows.map(_.getAs[Long]("n")).toSeq shouldBe Seq(2L, 2L, 2L, 2L)
    // interpolated edges: (8-1)*p + 1 -> 2.75, 4.5, 6.25
    rows(0).getAs[Double]("lo") shouldBe Double.NegativeInfinity
    rows(0).getAs[Double]("hi") shouldBe 2.75 +- 1e-12
    rows(1).getAs[Double]("lo") shouldBe 2.75 +- 1e-12
    rows(2).getAs[Double]("hi") shouldBe 6.25 +- 1e-12
    rows(3).getAs[Double]("hi") shouldBe Double.PositiveInfinity
    rows.map(_.getAs[Double]("mean_value")).toSeq shouldBe
      Seq(1.5, 3.5, 5.5, 7.5)
  }

  test("quantileBin: a constant column collapses into the top bin; args validated") {
    val const = Seq.fill(6)(3.0).toDF("v")
    val rows = Encoding.quantileBin(const, "v", k = 3).collect()
    // every edge equals 3.0 and v >= edge everywhere: one census row
    rows.length shouldBe 1
    rows.head.getLong(0) shouldBe 2L
    rows.head.getAs[Long]("n") shouldBe 6L
    rows.head.getAs[Double]("mean_value") shouldBe 3.0 +- 1e-12
    an[IllegalArgumentException] should be thrownBy
      Encoding.quantileBin(const, "v", k = 1)
  }
}
