package graft.tableone

import org.scalatest.funsuite.AnyFunSuite

/** Golden constants computed independently with numpy closed forms +
  * Numerical-Recipes incomplete beta/gamma (see project notes) — i.e. the
  * same math scipy implements, not commons-math3 round-tripped.
  */
class StatTestsSpec extends AnyFunSuite {
  private val eps = 1e-9

  private def moments(xs: Seq[Double]): GroupMoments = {
    val n = xs.size
    val mean = xs.sum / n
    val varS = if (n > 1) xs.map(x => (x - mean) * (x - mean)).sum / (n - 1) else Double.NaN
    GroupMoments(n, mean, varS)
  }

  test("pooled t-test matches scipy ttest_ind (equal_var)") {
    // a=[10,20,15,29], b=[55,20,16,18] -> t=-0.8636492308287561, p=0.42095876909569063
    val r = StatTests.pooledTTest(moments(Seq(10, 20, 15, 29)), moments(Seq(55, 20, 16, 18)))
    assert(r.testName == "t-test")
    assert(math.abs(r.testValue - (-0.8636492308287561)) < eps)
    assert(math.abs(r.pValue - 0.42095876909569063) < eps)
  }

  test("t-test sign flips with group order") {
    val a = moments(Seq(10, 20, 15, 29)); val b = moments(Seq(55, 20, 16, 18))
    assert(math.abs(StatTests.pooledTTest(a, b).testValue + StatTests.pooledTTest(b, a).testValue) < eps)
  }

  test("one-way ANOVA matches scipy f_oneway") {
    // fixture ages by plan: F=0.498158379373849, p=0.6970024854827013
    val groups = Seq(
      moments(Seq(18, 21, 70, 85)), moments(Seq(25, 19)),
      moments(Seq(55, 28)), moments(Seq(65, 34)))
    val r = StatTests.oneWayAnova(groups)
    assert(r.testName == "ANOVA")
    assert(math.abs(r.testValue - 0.498158379373849) < eps)
    assert(math.abs(r.pValue - 0.6970024854827013) < eps)
  }

  test("ANOVA with <2 groups is NOT DONE") {
    assert(StatTests.oneWayAnova(Seq(moments(Seq(1, 2, 3)))).testName == "NOT DONE")
  }

  test("chi-square (no Yates, 3x4) matches scipy chi2_contingency") {
    // name x plan contingency: chi2=6.0, dof=6, p=0.4231900811268434
    val obs = Array(Array(0L, 1L, 0L, 2L), Array(1L, 0L, 1L, 2L), Array(0L, 1L, 0L, 0L))
    val r = StatTests.chiSquare(obs)
    assert(math.abs(r.testValue - 6.0) < eps)
    assert(math.abs(r.pValue - 0.4231900811268434) < eps)
  }

  test("chi-square applies Yates on 2x2") {
    // [[3,1],[1,3]] -> chi2=0.5, p=0.4795001221869536 (scipy default correction)
    val r = StatTests.chiSquare(Array(Array(3L, 1L), Array(1L, 3L)))
    assert(math.abs(r.testValue - 0.5) < eps)
    assert(math.abs(r.pValue - 0.4795001221869536) < eps)
  }

  test("chi-square drops all-zero rows/cols before the dof decision") {
    // 3x3 with an all-zero row and col reduces to 2x2 -> Yates applies
    val r = StatTests.chiSquare(Array(Array(3L, 0L, 1L), Array(0L, 0L, 0L), Array(1L, 0L, 3L)))
    assert(math.abs(r.testValue - 0.5) < eps)
  }

  test("chi-square single row/col -> dof 0 -> p=1, chi2=0 (scipy behavior)") {
    val r = StatTests.chiSquare(Array(Array(5L, 7L, 2L)))
    assert(r.pValue == 1.0 && r.testValue == 0.0)
  }

  test("degenerate t-test returns NaN") {
    val r = StatTests.pooledTTest(moments(Seq(1)), moments(Seq(2)))
    assert(r.pValue.isNaN)
  }
}
