package graft.tableone

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, FDistribution, TDistribution}

/** Result of an inferential test attached to a Table 1 variable. */
final case class TestResult(testName: String, pValue: Double, testValue: Double)

/** Per-group sufficient statistics for the continuous tests.
  * Computed distributedly (one `groupBy(strat).agg` pass); only these
  * scalars ever reach the driver — never raw rows.
  *
  * `variance` is the sample (n-1) variance (`var_samp`).
  */
final case class GroupMoments(n: Long, mean: Double, variance: Double)

/** Driver-side inferential statistics over pre-aggregated inputs.
  *
  * Mirrors the reference's scipy behavior
  * (/root/reference/tableone_pyspark.py:445-528) but re-derived from
  * closed-form formulas over sufficient statistics + commons-math3
  * distribution CDFs, so the 100 TB path never collects raw data:
  *   - 2 groups  -> Student's pooled-variance t-test (scipy `ttest_ind`
  *     with its default `equal_var=True`, tableone_pyspark.py:463)
  *   - >2 groups -> one-way ANOVA (scipy `f_oneway`, :471)
  *   - contingency table -> chi-square (scipy `chi2_contingency`, :510),
  *     with Yates continuity correction iff the table is 2x2 (scipy's
  *     default `correction=True` only applies when dof == 1).
  */
object StatTests {

  val NotDone: TestResult = TestResult("NOT DONE", Double.NaN, Double.NaN)

  /** Student's two-sample pooled-variance t-test from group moments.
    * Equivalent to scipy.stats.ttest_ind(a, b) (equal_var=True).
    * Returns NaN statistics for degenerate inputs (n < 2 total dof, zero
    * pooled variance), matching scipy's NaN propagation.
    */
  def pooledTTest(a: GroupMoments, b: GroupMoments): TestResult = {
    val dof = a.n + b.n - 2
    if (a.n < 1 || b.n < 1 || dof <= 0) return TestResult("t-test", Double.NaN, Double.NaN)
    val varA = if (a.n > 1) a.variance else 0.0
    val varB = if (b.n > 1) b.variance else 0.0
    val pooled = ((a.n - 1) * varA + (b.n - 1) * varB) / dof
    val se = math.sqrt(pooled * (1.0 / a.n + 1.0 / b.n))
    val t = (a.mean - b.mean) / se
    if (t.isNaN || t.isInfinite) return TestResult("t-test", Double.NaN, t)
    val p = 2.0 * (1.0 - new TDistribution(dof.toDouble).cumulativeProbability(math.abs(t)))
    TestResult("t-test", p, t)
  }

  /** One-way ANOVA from k group moments (n_i, mean_i, var_samp_i).
    * Equivalent to scipy.stats.f_oneway(*groups):
    *   SS_between = sum n_i (mean_i - grand)^2, dof k-1
    *   SS_within  = sum (n_i - 1) var_i,        dof N-k
    * Groups with n == 0 are dropped (an empty group cannot occur in the
    * Table 1 flow: strata are discovered from the data).
    */
  def oneWayAnova(groups: Seq[GroupMoments]): TestResult = {
    val gs = groups.filter(_.n > 0)
    val k = gs.size
    if (k < 2) return NotDone
    val total = gs.map(_.n).sum
    if (total <= k) return TestResult("ANOVA", Double.NaN, Double.NaN)
    val grand = gs.map(g => g.mean * g.n).sum / total
    val ssb = gs.map(g => g.n * (g.mean - grand) * (g.mean - grand)).sum
    val ssw = gs.map(g => if (g.n > 1) (g.n - 1) * g.variance else 0.0).sum
    val dofB = (k - 1).toDouble
    val dofW = (total - k).toDouble
    val msb = ssb / dofB
    val msw = ssw / dofW
    val f = msb / msw
    if (f.isNaN || f.isInfinite) return TestResult("ANOVA", Double.NaN, f)
    val p = 1.0 - new FDistribution(dofB, dofW).cumulativeProbability(f)
    TestResult("ANOVA", p, f)
  }

  /** Pearson chi-square test of independence over an observed contingency
    * matrix (rows = categories, cols = strata). Equivalent to
    * scipy.stats.chi2_contingency(observed) with its defaults: Yates
    * continuity correction is applied iff dof == 1 (2x2 after dropping
    * all-zero rows/columns — pd.crosstab never produces those, so we drop
    * them first for parity).
    * dof == 0 (single row or column) -> chi2 = 0, p = 1 (scipy behavior).
    */
  def chiSquare(observed: Array[Array[Long]]): TestResult = {
    // Drop all-zero rows/columns (cannot arise from a crosstab of real
    // rows, but callers may build the matrix from a wider pivot).
    val rows = observed.filter(_.exists(_ != 0L))
    if (rows.isEmpty) return TestResult("Chi-Square", Double.NaN, Double.NaN)
    val nCols0 = rows.head.length
    val keepCols = (0 until nCols0).filter(j => rows.exists(r => r(j) != 0L))
    val m = rows.map(r => keepCols.map(r(_)).toArray)
    val nr = m.length
    val nc = keepCols.length
    if (nr == 0 || nc == 0) return TestResult("Chi-Square", Double.NaN, Double.NaN)
    val dof = (nr - 1) * (nc - 1)
    if (dof == 0) return TestResult("Chi-Square", 1.0, 0.0)
    val rowSums = m.map(_.sum.toDouble)
    val colSums = (0 until nc).map(j => m.map(_(j)).sum.toDouble).toArray
    val grand = rowSums.sum
    val yates = dof == 1
    var chi2 = 0.0
    var i = 0
    while (i < nr) {
      var j = 0
      while (j < nc) {
        val expected = rowSums(i) * colSums(j) / grand
        val diff0 = math.abs(m(i)(j) - expected)
        val diff = if (yates) math.max(0.0, diff0 - 0.5) else diff0
        chi2 += diff * diff / expected
        j += 1
      }
      i += 1
    }
    val p = 1.0 - new ChiSquaredDistribution(dof.toDouble).cumulativeProbability(chi2)
    TestResult("Chi-Square", p, chi2)
  }
}
