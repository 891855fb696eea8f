package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SurvivalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kaplanMeier matches the hand-traced curve, censoring included") {
    // a: ev@1, ev@2 + cens@2, ev@4, cens@5
    val df = Seq(("a", 1.0, 1), ("a", 2.0, 1), ("a", 2.0, 0), ("a", 4.0, 1),
      ("a", 5.0, 0)).toDF("g", "dur", "ev")
    val rows = Survival.kaplanMeier(df.repartition(3), "g", "dur", "ev")
      .orderBy("t").collect()
    rows.map(_.getAs[Double]("t")).toSeq shouldBe Seq(1.0, 2.0, 4.0, 5.0)
    rows.map(_.getAs[Long]("n_risk")).toSeq shouldBe Seq(5L, 4L, 2L, 1L)
    rows.map(_.getAs[Long]("n_event")).toSeq shouldBe Seq(1L, 1L, 1L, 0L)
    rows.map(_.getAs[Long]("n_censor")).toSeq shouldBe Seq(0L, 1L, 0L, 1L)
    val s = rows.map(_.getAs[Double]("survival"))
    s(0) shouldBe 0.8 +- 1e-12
    s(1) shouldBe 0.6 +- 1e-12
    s(2) shouldBe 0.3 +- 1e-12
    s(3) shouldBe 0.3 +- 1e-12 // censoring does not move the curve
  }

  test("kaplanMeier hits exact zero on a terminal event without ln(0)") {
    val df = Seq(("b", 1.0, 1), ("b", 2.0, 1), ("b", 2.0, 1)).toDF("g", "dur", "ev")
    val rows = Survival.kaplanMeier(df, "g", "dur", "ev").orderBy("t").collect()
    rows(0).getAs[Double]("survival") shouldBe (2.0 / 3.0) +- 1e-12
    rows(1).getAs[Double]("survival") shouldBe 0.0
  }

  test("logRank matches the hand-traced two-group walk") {
    // a: ev@1, cens@3; b: ev@2, ev@3
    // E_a = 1/2 + 1/3 + 1/2 = 4/3; V = 1/4 + 2/9 + 1/4 = 13/18; O_a = 1
    val df = Seq(("a", 1.0, 1), ("a", 3.0, 0), ("b", 2.0, 1), ("b", 3.0, 1))
      .toDF("g", "dur", "ev")
    val r = Survival.logRank(df.repartition(4), "g", "dur", "ev").head()
    r.getAs[String]("group_lo") shouldBe "a"
    r.getAs[Long]("o_lo") shouldBe 1L
    r.getAs[Double]("e_lo") shouldBe (4.0 / 3.0) +- 1e-12
    r.getAs[Double]("z") shouldBe (-(1.0 / 3.0) / math.sqrt(13.0 / 18.0)) +- 1e-12
    r.getAs[Double]("chi2") shouldBe (2.0 / 13.0) +- 1e-12
  }

  test("logRank rejects non-two-group inputs; identical groups give z near 0") {
    an[IllegalArgumentException] should be thrownBy
      Survival.logRank(Seq(("a", 1.0, 1)).toDF("g", "dur", "ev"), "g", "dur", "ev")
    val sym = Seq(("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1), ("b", 2.0, 1))
      .toDF("g", "dur", "ev")
    val r = Survival.logRank(sym, "g", "dur", "ev").head()
    r.getAs[Double]("e_lo") shouldBe r.getAs[Long]("o_lo").toDouble +- 1e-12
    r.getAs[Double]("z") shouldBe 0.0 +- 1e-12
  }

  test("curves are partitioning-independent") {
    val df = (1 to 300).map(i => (if (i % 2 == 0) "a" else "b",
      (i % 17 + 1).toDouble, i % 3 min 1)).toDF("g", "dur", "ev")
    val one = Survival.kaplanMeier(df.repartition(1), "g", "dur", "ev")
      .orderBy("g", "t").collect().map(_.toSeq).toSeq
    val many = Survival.kaplanMeier(df.repartition(11), "g", "dur", "ev")
      .orderBy("g", "t").collect().map(_.toSeq).toSeq
    many shouldBe one
  }

  test("nelsonAalen: d/n running sum, censoring thins the risk set, no absorbing zero") {
    // one group: event@1, censor@2, two events@3 (d = n at the end)
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1)).map { case (t, e) => ("g", t, e) }
      .toDF("grp", "dur", "ev")
    val rows = Survival.nelsonAalen(df.repartition(3), "grp", "dur", "ev")
      .orderBy("t").collect()
    rows.map(_.getAs[Long]("n_risk")).toSeq shouldBe Seq(4L, 3L, 2L)
    rows.map(_.getAs[Long]("n_event")).toSeq shouldBe Seq(1L, 0L, 2L)
    val h = rows.map(_.getAs[Double]("cum_hazard"))
    h(0) shouldBe 0.25 +- 1e-12
    h(1) shouldBe 0.25 +- 1e-12       // censor-only time adds nothing
    h(2) shouldBe 1.25 +- 1e-12       // terminal d = n adds the finite d/n = 1
    // KM at the same terminal time is the absorbing zero — the two
    // estimators diverge exactly where NA is preferred
    Survival.kaplanMeier(df, "grp", "dur", "ev").orderBy("t").collect()
      .last.getAs[Double]("survival") shouldBe 0.0 +- 1e-12
  }
}
