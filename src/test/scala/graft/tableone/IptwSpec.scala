package graft.tableone

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IptwSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stabilizedWeights: stabilization, clamping, and degenerate-score NULLs") {
    val df = Seq((1, 0.8), (0, 0.2), (1, 0.01), (0, 0.5), (1, 1.0), (0, 0.0))
      .toDF("treat", "ps")
    // p = 3/6 = 0.5
    val w = Iptw.stabilizedWeights(df, "treat", "ps", clampLo = 0.1, clampHi = 10.0)
      .collect().map(r => (r.getInt(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    w((1, 0.8)).get shouldBe 0.625 +- 1e-12 // 0.5/0.8
    w((0, 0.2)).get shouldBe 0.625 +- 1e-12 // 0.5/0.8
    w((1, 0.01)).get shouldBe 10.0 +- 1e-12 // 50 clamped
    w((0, 0.5)).get shouldBe 1.0 +- 1e-12
    w((1, 1.0)) shouldBe None // ps outside (0,1)
    w((0, 0.0)) shouldBe None
    an[IllegalArgumentException] should be thrownBy
      Iptw.stabilizedWeights(df, "treat", "ps", clampLo = 0.0)
    an[IllegalArgumentException] should be thrownBy
      Iptw.stabilizedWeights(Seq((1, 0.5)).toDF("treat", "ps"), "treat", "ps")
  }

  test("weightedBalance matches the hand-traced weighted moments") {
    // treated: x=1,3 w=1; control: x=2,6 w=2
    val df = Seq((1, 1.0, 1.0), (1, 1.0, 3.0), (0, 2.0, 2.0), (0, 2.0, 6.0))
      .toDF("treat", "w", "x")
    val r = Iptw.weightedBalance(df.repartition(3), "treat", "w", Seq("x")).head()
    r.getAs[String]("variable") shouldBe "x"
    r.getAs[Long]("n_t") shouldBe 2L
    r.getAs[Long]("n_c") shouldBe 2L
    r.getAs[Double]("ess_t") shouldBe 2.0 +- 1e-12
    r.getAs[Double]("ess_c") shouldBe 2.0 +- 1e-12
    r.getAs[Double]("wmean_t") shouldBe 2.0 +- 1e-12
    r.getAs[Double]("wmean_c") shouldBe 4.0 +- 1e-12
    // v_t = 1, v_c = 4, pooled 2.5
    r.getAs[Double]("wsmd") shouldBe (-2.0 / math.sqrt(2.5)) +- 1e-12
  }

  test("weighting toward balance drives wsmd to 0; constant covariates give NULL") {
    // same x-distribution once weights equalize the arms
    val df = Seq((1, 1.0, 5.0), (1, 1.0, 7.0), (0, 0.5, 5.0), (0, 0.5, 5.0),
      (0, 0.5, 7.0), (0, 0.5, 7.0)).toDF("treat", "w", "x")
    val r = Iptw.weightedBalance(df, "treat", "w", Seq("x")).head()
    r.getAs[Double]("wsmd") shouldBe 0.0 +- 1e-12
    val const = Seq((1, 1.0, 4.0), (0, 1.0, 4.0)).toDF("treat", "w", "x")
    val rc = Iptw.weightedBalance(const, "treat", "w", Seq("x")).head()
    rc.isNullAt(rc.fieldIndex("wsmd")) shouldBe true
    // ess equals n when weights are uniform
    rc.getAs[Double]("ess_t") shouldBe 1.0 +- 1e-12
  }
}
