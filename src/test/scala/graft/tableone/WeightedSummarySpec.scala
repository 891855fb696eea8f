package graft.tableone

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WeightedSummarySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows = Seq(
    // (stratum, cat, x, w)
    ("A", "Y", 10.0, 1.0), ("A", "Y", 20.0, 3.0), ("A", "N", 30.0, 2.0),
    ("B", "Y", 5.0, 0.5), ("B", "N", 15.0, 0.5))
    .toDF("g", "c", "x", "w")

  test("weighted counts, percents, mean, and frequency-weight SD are exact") {
    val out = WeightedSummary.summarize(rows, Some("g"), Seq("c"), Seq("x"), "w")
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getString(2)) ->
        ((r.getDouble(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // stratum A: total weight 6; level Y weight 4 -> 66.666%, N 2 -> 33.333%
    val (nY, pY, _, _) = out(("c", Some("Y"), "A"))
    nY shouldBe 4.0
    pY.get.asInstanceOf[Double] shouldBe (4.0 / 6.0 * 100.0) +- 1e-9
    // continuous A: sw=6, swx=10+60+60=130, mean=130/6
    val (nA, _, mA, sA) = out(("x", None, "A"))
    nA shouldBe 6.0
    mA.get.asInstanceOf[Double] shouldBe (130.0 / 6.0) +- 1e-9
    // sd: swx2 = 100 + 3*400 + 2*900 = 3100; var = (3100 - 130^2/6)/5
    sA.get.asInstanceOf[Double] shouldBe
      math.sqrt((3100.0 - 130.0 * 130.0 / 6.0) / 5.0) +- 1e-9
    // stratum B: total weight exactly 1.0 -> sample SD undefined -> null
    val (nB, _, mB, sB) = out(("x", None, "B"))
    nB shouldBe 1.0
    mB.get.asInstanceOf[Double] shouldBe 10.0 +- 1e-9 // (0.5*5 + 0.5*15) / 1
    sB shouldBe None
  }

  test("unstratified mode produces one Overall stratum") {
    val out = WeightedSummary.summarize(rows, None, Seq("c"), Nil, "w")
      .select("stratum").distinct().as[String].collect()
    out shouldBe Array("Overall")
  }

  test("null weights are excluded, null continuous values excluded from moments") {
    val df = Seq(
      ("A", "Y", Some(10.0), Some(2.0)),
      ("A", "Y", Some(99.0), None),      // null weight -> excluded everywhere
      ("A", "N", None, Some(3.0)))       // null x -> counts for cat, not cont
      .toDF("g", "c", "x", "w")
    val out = WeightedSummary.summarize(df, Some("g"), Seq("c"), Seq("x"), "w")
      .collect().map(r => (r.getString(0), Option(r.getString(1))) ->
        r.getDouble(3)).toMap
    out(("c", Some("Y"))) shouldBe 2.0
    out(("c", Some("N"))) shouldBe 3.0
    out(("x", None)) shouldBe 2.0 // only the (10.0, w=2) row has non-null x
  }

  test("weight 1 everywhere reduces to unweighted statistics") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0))
      .toDF("g", "x").withColumn("w", org.apache.spark.sql.functions.lit(1.0))
    val r = WeightedSummary.summarize(df, Some("g"), Nil, Seq("x"), "w").head()
    r.getDouble(3) shouldBe 4.0                       // n
    r.getDouble(5) shouldBe 2.5 +- 1e-12              // mean
    r.getDouble(6) shouldBe math.sqrt(5.0 / 3.0) +- 1e-12 // sample sd
  }
}
