package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PcaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobiEigen solves the 2x2 textbook matrix") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val asc = vals.sorted
    asc(0) shouldBe 1.0 +- 1e-12
    asc(1) shouldBe 3.0 +- 1e-12
    val i3 = if (vals(0) > vals(1)) 0 else 1
    // eigenvector of eigenvalue 3 is (1,1)/sqrt(2) up to sign
    val v3 = Array(vecs(0)(i3), vecs(1)(i3))
    math.abs(v3(0)) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-10
    math.abs(v3(1) - v3(0)) should be < 1e-10
  }

  test("covFrame equals the hand covariance on a 2-dim fixture") {
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
    val got = Pca.covFrame(df, "v", dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    got((0L, 0L)) shouldBe 2.0 +- 1e-12
    got((0L, 1L)) shouldBe 2.0 +- 1e-12
    got((1L, 1L)) shouldBe 2.0 +- 1e-12
  }

  test("fit: descending spectrum, trace identity, orthonormal pinned-sign components") {
    // planted 4-dim data: big variance on dim0, small on dim1, dims 2-3
    // constant — components should align with the axes
    val rows = (0 until 12).map(i =>
      Seq(i.toDouble, (i % 3).toDouble * 0.1, 5.0, 7.0))
    val df = rows.toDF("v").repartition(3)
    val m = Pca.fit(df, "v", dim = 4, k = 4)
    m.n shouldBe 12L
    m.eigenvalues.sliding(2).foreach { case Seq(a, b) => a should be >= b }
    // trace = sum of ALL eigenvalues = sum of the marginal variances
    val vars = (0 until 4).map { d =>
      val xs = rows.map(_(d)); val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1)
    }
    m.totalVariance shouldBe vars.sum +- 1e-9
    m.eigenvalues.sum shouldBe vars.sum +- 1e-9
    // top component is (nearly) the dim0 axis — i%3 correlates weakly
    // with i, tilting it by ~1e-5 — with the sign pinned positive
    math.abs(m.components.head(0)) should be > 0.999
    m.components.head(0) should be > 0.0
    // orthonormality
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      if (a eq b) dot shouldBe 1.0 +- 1e-9 else dot shouldBe 0.0 +- 1e-9
    }
  }

  test("project: score variance matches the eigenvalue, scores are centered") {
    val rows = (0 until 20).map { i =>
      // correlated 3-dim cloud with exact structure
      val a = i.toDouble; val b = (i % 5).toDouble
      Seq(a + b, a - b, 2.0 * a)
    }
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", dim = 3, k = 2)
    val scored = Pca.project(df, "v", m, k = 2)
      .agg(avg("score_0").as("m0"), variance(col("score_0")).as("v0"),
        avg("score_1").as("m1"), variance(col("score_1")).as("v1")).head()
    scored.getDouble(0) shouldBe 0.0 +- 1e-9
    scored.getDouble(2) shouldBe 0.0 +- 1e-9
    scored.getDouble(1) shouldBe m.eigenvalues(0) +- 1e-6
    scored.getDouble(3) shouldBe m.eigenvalues(1) +- 1e-6
  }

  test("fit validates dims and row counts; wrong-length vectors are excluded") {
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(9.0)).toDF("v")
    // the length-1 row is dropped by the size gate, n = 2 survives
    Pca.fit(df, "v", dim = 2, k = 1).n shouldBe 2L
    an[IllegalArgumentException] should be thrownBy Pca.fit(df, "v", 0, 1)
    an[IllegalArgumentException] should be thrownBy Pca.fit(df, "v", 2, 3)
    an[IllegalArgumentException] should be thrownBy
      Pca.covFrame(Seq(Seq(1.0, 2.0)).toDF("v"), "v", 600)
  }
}
