package graft.tableone

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SmdSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("continuous SMD matches the hand-computed two-stratum fixture") {
    // stratum a: (1, 2, 3) mean 2, sample var 1
    // stratum b: (4, 6, 8, 10) mean 7, sample var 20/3
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 6.0, 8.0, 10.0).map(("b", _))).toDF("s", "x")
    val r = Smd.pairwise(df.repartition(3), "s", Seq("x")).head()
    r.getAs[String]("variable") shouldBe "x"
    r.getAs[String]("strat_a") shouldBe "a"
    r.getAs[Long]("n_a") shouldBe 3L
    r.getAs[Long]("n_b") shouldBe 4L
    val want = (2.0 - 7.0) / math.sqrt((1.0 + 20.0 / 3.0) / 2.0)
    r.getAs[Double]("smd") shouldBe want +- 1e-12
  }

  test("binary SMD uses the proportion formula; identical strata give 0; constants give NULL") {
    // a: 3 of 4 positive (p=0.75); b: 1 of 4 positive (p=0.25)
    val df = (Seq(1.0, 1.0, 1.0, 0.0).map(("a", _)) ++
      Seq(1.0, 0.0, 0.0, 0.0).map(("b", _))).toDF("s", "y")
    val r = Smd.pairwise(df, "s", Nil, Seq("y")).head()
    r.getAs[String]("kind") shouldBe "bin"
    val want = (0.75 - 0.25) / math.sqrt((0.75 * 0.25 + 0.25 * 0.75) / 2.0)
    r.getAs[Double]("smd") shouldBe want +- 1e-12
    // identical distributions -> 0 exactly
    val same = (Seq(1.0, 0.0).map(("a", _)) ++ Seq(1.0, 0.0).map(("b", _))).toDF("s", "y")
    Smd.pairwise(same, "s", Nil, Seq("y")).head().getAs[Double]("smd") shouldBe 0.0
    // both strata the same constant -> pooled variance 0 -> NULL, not Inf
    val const = (Seq(1.0, 1.0).map(("a", _)) ++ Seq(1.0, 1.0).map(("b", _))).toDF("s", "y")
    Smd.pairwise(const, "s", Nil, Seq("y")).head().isNullAt(6) shouldBe true
  }

  test("three strata emit all ordered pairs; null strata and values drop per variable") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(2.0)), ("b", Some(6.0)),
      ("c", Some(4.0)), ("c", Some(8.0)), ("c", None),
      (null.asInstanceOf[String], Some(99.0))).toDF("s", "x")
    val rows = Smd.pairwise(df, "s", Seq("x")).orderBy("strat_a", "strat_b").collect()
    rows.map(r => (r.getString(2), r.getString(3))).toSeq shouldBe
      Seq(("a", "b"), ("a", "c"), ("b", "c"))
    rows(1).getAs[Long]("n_b") shouldBe 2L // c's null value dropped
    an[IllegalArgumentException] should be thrownBy Smd.pairwise(df, "s", Nil)
    an[IllegalArgumentException] should be thrownBy
      Smd.pairwise(df, "s", Seq("x"), Seq("x"))
  }
}
