package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AssociationAuditSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("associationStats: perfect association gives V=1 and MI=ln(2)") {
    val df = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y"))).toDF("a", "b")
    val r = Association.associationStats(df.repartition(3), "a", "b").head()
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Long]("n_a") shouldBe 2L
    r.getAs[Double]("chi2") shouldBe 10.0 +- 1e-12
    r.getAs[Double]("cramers_v") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("mutual_info") shouldBe math.log(2.0) +- 1e-12
  }

  test("associationStats: independence gives 0; constant column gives NULL V") {
    val indep = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25)
      yield (a, b)).toDF("a", "b")
    val r = Association.associationStats(indep, "a", "b").head()
    r.getAs[Double]("chi2") shouldBe 0.0 +- 1e-12
    r.getAs[Double]("cramers_v") shouldBe 0.0 +- 1e-12
    r.getAs[Double]("mutual_info") shouldBe 0.0 +- 1e-12
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val rc = Association.associationStats(const, "a", "b").head()
    rc.isNullAt(rc.fieldIndex("cramers_v")) shouldBe true
    rc.getAs[Double]("chi2") shouldBe 0.0 +- 1e-12
  }

  test("associationStats counts absent cells through the expectation residual") {
    // L-shaped table: (x,u)=4, (x,v)=4, (y,u)=4 — cell (y,v) absent
    val df = (Seq.fill(4)(("x", "u")) ++ Seq.fill(4)(("x", "v")) ++
      Seq.fill(4)(("y", "u"))).toDF("a", "b")
    val r = Association.associationStats(df, "a", "b").head()
    // marginals: x=8,y=4; u=8,v=4; e(y,v) = 4*4/12 = 4/3 contributes fully
    val e = Map(("x", "u") -> 16.0 / 3, ("x", "v") -> 8.0 / 3, ("y", "u") -> 8.0 / 3)
    val chiObs = e.map { case (k, ev) =>
      val o = if (k == ("x", "u")) 4.0 else 4.0
      (o - ev) * (o - ev) / ev
    }.sum
    r.getAs[Double]("chi2") shouldBe (chiObs + (12.0 - e.values.sum)) +- 1e-9
  }

  test("benford takes digits from the decimal string, not log10") {
    val df = Seq(1L, 10L, 100L, 1000L, 999L, 23L, 0L, -5L).toDF("v")
    val by = Audit.benford(df.repartition(3), "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    by(1)._1 shouldBe 4L // 1, 10, 100, 1000 — powers of ten stay digit 1
    by(9)._1 shouldBe 1L
    by(2)._1 shouldBe 1L
    by.values.map(_._1).sum shouldBe 6L // 0 and -5 excluded
    by(1)._2 shouldBe (4.0 / 6.0) +- 1e-12
    val exp1 = Audit.benford(df, "v").filter("digit = 1")
      .head().getAs[Double]("exp_freq")
    exp1 shouldBe math.log10(2.0) +- 1e-12
  }

  test("groupedGini matches hand traces and brute force") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 4.0), // G = 1/3
      ("b", 5.0), ("b", 5.0), // equal -> 0
      ("c", 0.0), ("c", 2.0), // one holder of everything -> (n-1)/n = 1/2
      ("z", 0.0), ("z", 0.0)) // zero total -> NULL
      .toDF("g", "x")
    val by = Audit.groupedGini(df.repartition(4), "g", "x")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    by("a").getAs[Double]("gini") shouldBe (1.0 / 3.0) +- 1e-12
    by("a").getAs[Double]("mean") shouldBe 2.0 +- 1e-12
    by("b").getAs[Double]("gini") shouldBe 0.0 +- 1e-12
    by("c").getAs[Double]("gini") shouldBe 0.5 +- 1e-12
    by("z").isNullAt(by("z").fieldIndex("gini")) shouldBe true
    // brute-force parity on a pseudo-random group
    val xs = (1 to 60).map(i => (i * 37 % 23).toDouble)
    val g = Audit.groupedGini(xs.map(("r", _)).toDF("g", "x"), "g", "x")
      .head().getAs[Double]("gini")
    val n = xs.length
    val brute = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum /
      (2.0 * n * n * (xs.sum / n))
    g shouldBe brute +- 1e-9
  }

  test("groupedTheil matches the closed form and skips non-positive values") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 4.0), ("a", 0.0), ("a", -3.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)) // equal -> both indices 0
      .toDF("g", "x")
    val by = Audit.groupedTheil(df.repartition(4), "g", "x")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    by("a").getAs[Long]("n") shouldBe 3L // 0 and -3 excluded (ln undefined)
    by("a").getAs[Double]("mean") shouldBe 2.0 +- 1e-12
    by("a").getAs[Double]("theil_t") shouldBe 0.2310490601866484 +- 1e-12
    by("a").getAs[Double]("theil_l") shouldBe 0.2310490601866484 +- 1e-12
    by("b").getAs[Double]("theil_t") shouldBe 0.0 +- 1e-12
    by("b").getAs[Double]("theil_l") shouldBe 0.0 +- 1e-12
  }

  test("twoProportionZ tests each group against its complement") {
    val df = Seq.fill(4)(("a", 1)) ++ Seq(("a", 0)) ++
      Seq(("b", 1)) ++ Seq.fill(4)(("b", 0))
    val by = Association.twoProportionZ(df.toDF("g", "s").repartition(3), "g", "s")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // pooled p = 0.5: z = (0.8 - 0.2) / sqrt(0.25 * (1/5 + 1/5))
    val want = 0.6 / math.sqrt(0.25 * 0.4)
    by("a").getAs[Long]("n") shouldBe 5L
    by("a").getAs[Long]("successes") shouldBe 4L
    by("a").getAs[Double]("p_group") shouldBe 0.8 +- 1e-12
    by("a").getAs[Double]("p_rest") shouldBe 0.2 +- 1e-12
    by("a").getAs[Double]("z") shouldBe want +- 1e-12
    by("b").getAs[Double]("z") shouldBe -want +- 1e-12
    // single group -> empty complement -> z NULL; all-success -> phat = 1 -> NULL
    val solo = Association.twoProportionZ(
      Seq(("x", 1), ("x", 0)).toDF("g", "s"), "g", "s").head()
    solo.isNullAt(solo.fieldIndex("z")) shouldBe true
    val ones = Association.twoProportionZ(
      Seq(("x", 1), ("y", 1)).toDF("g", "s"), "g", "s").head()
    ones.isNullAt(ones.fieldIndex("z")) shouldBe true
  }

  test("wilsonInterval matches the closed form and stays inside [0, 1]") {
    val df = (Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 0)) ++
      Seq.fill(3)(("b", 1))).toDF("g", "s") // b: p_hat = 1 at n = 3
    val by = Association.wilsonInterval(df.repartition(3), "g", "s")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val z = 1.959963984540054
    def wilson(x: Long, n: Long): (Double, Double) = {
      val ph = x.toDouble / n; val z2 = z * z
      val den = 1.0 + z2 / n
      val c = (ph + z2 / (2.0 * n)) / den
      val h = z * math.sqrt(ph * (1 - ph) / n + z2 / (4.0 * n * n)) / den
      (c - h, c + h)
    }
    val (lo, hi) = wilson(5, 10)
    by("a").getAs[Double]("p_hat") shouldBe 0.5 +- 1e-15
    by("a").getAs[Double]("ci_lo") shouldBe lo +- 1e-12
    by("a").getAs[Double]("ci_hi") shouldBe hi +- 1e-12
    // degenerate p_hat = 1: the interval collapses toward 1 but stays <= 1
    val (blo, bhi) = wilson(3, 3)
    by("b").getAs[Double]("ci_lo") shouldBe blo +- 1e-12
    by("b").getAs[Double]("ci_hi") shouldBe bhi +- 1e-12
    bhi shouldBe 1.0 +- 1e-12
    blo should be > 0.2
    an[IllegalArgumentException] should be thrownBy
      Association.wilsonInterval(df, "g", "s", z = 0.0)
  }

  test("cochranArmitage detects a monotone trend and zeroes a flat one") {
    // rates 1/4, 2/4, 3/4 at scores 1,2,3: T = 2, Var = 2, z = sqrt(2)
    def rows(xs: Seq[(Int, Int, Int)]) = // (score, n, successes)
      xs.flatMap { case (w, n, x) =>
        Seq.fill(x)((w, 1)) ++ Seq.fill(n - x)((w, 0))
      }.toDF("w", "s")
    val up = Association.cochranArmitage(
      rows(Seq((1, 4, 1), (2, 4, 2), (3, 4, 3))).repartition(3), "w", "s").head()
    up.getAs[Long]("n_groups") shouldBe 3L
    up.getAs[Long]("n") shouldBe 12L
    up.getAs[Long]("successes") shouldBe 6L
    up.getAs[Double]("t_stat") shouldBe 2.0 +- 1e-12
    up.getAs[Double]("z") shouldBe math.sqrt(2.0) +- 1e-12
    val flat = Association.cochranArmitage(
      rows(Seq((1, 4, 2), (2, 4, 2), (3, 4, 2))), "w", "s").head()
    flat.getAs[Double]("z") shouldBe 0.0 +- 1e-12
    // degenerate p-bar (all successes) and constant score -> z NULL
    val allOne = Association.cochranArmitage(
      rows(Seq((1, 3, 3), (2, 3, 3))), "w", "s").head()
    allOne.isNullAt(allOne.fieldIndex("z")) shouldBe true
    val oneScore = Association.cochranArmitage(
      rows(Seq((5, 6, 3))), "w", "s").head()
    oneScore.isNullAt(oneScore.fieldIndex("z")) shouldBe true
  }

  test("leveneTest matches the hand trace and NULLs degenerate inputs") {
    // a: x = 0,0,6 -> z = 2,2,4; b: x = 0,2 -> z = 1,1
    // ssb = 10/3, ssw = 8/3, W = 3 * (10/3)/(8/3) = 3.75
    val df = Seq(("a", 0.0), ("a", 0.0), ("a", 6.0), ("b", 0.0), ("b", 2.0))
      .toDF("g", "x")
    val r = Association.leveneTest(df.repartition(3), "g", "x").head()
    r.getAs[Long]("n_groups") shouldBe 2L
    r.getAs[Long]("n") shouldBe 5L
    r.getAs[Double]("ssb") shouldBe (10.0 / 3.0) +- 1e-9
    r.getAs[Double]("ssw") shouldBe (8.0 / 3.0) +- 1e-9
    r.getAs[Double]("w") shouldBe 3.75 +- 1e-9
    // one group -> k < 2 -> W NULL; constant z spread -> ssw 0 -> NULL
    val solo = Association.leveneTest(
      Seq(("a", 1.0), ("a", 5.0)).toDF("g", "x"), "g", "x").head()
    solo.isNullAt(solo.fieldIndex("w")) shouldBe true
    val const = Association.leveneTest(
      Seq(("a", 0.0), ("a", 4.0), ("b", 1.0), ("b", 3.0)).toDF("g", "x"),
      "g", "x").head()
    const.isNullAt(const.fieldIndex("w")) shouldBe true
  }

  test("mcnemar counts discordant pairs and applies the continuity correction") {
    // b = 3 (a=1,p=0), c = 1, agree = 2: chi2 = (|3-1|-1)^2 / 4 = 0.25
    val df = (Seq.fill(3)((1, 0)) ++ Seq((0, 1)) ++ Seq((1, 1), (0, 0)))
      .toDF("a", "p")
    val r = Association.mcnemar(df.repartition(3), "a", "p").head()
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Long]("n_agree") shouldBe 2L
    r.getAs[Long]("b") shouldBe 3L
    r.getAs[Long]("c") shouldBe 1L
    r.getAs[Double]("chi2") shouldBe 0.25 +- 1e-12
    // all-concordant: no discordant pairs -> chi2 NULL
    val agree = Association.mcnemar(
      Seq((1, 1), (0, 0)).toDF("a", "p"), "a", "p").head()
    agree.isNullAt(agree.fieldIndex("chi2")) shouldBe true
  }

  test("spearmanMatrix matches a driver-side tie-averaged reference, any partitioning") {
    val rnd = new scala.util.Random(13)
    // heavy ties (x quantized), monotone-ish y, independent z
    val rows = (1 to 400).map { i =>
      val x = (rnd.nextInt(10)).toDouble
      (x, x * 3 + rnd.nextDouble() * 4, rnd.nextDouble())
    }
    def avgRanks(v: Seq[Double]): Map[Double, Double] = {
      val sorted = v.sorted
      v.distinct.map { x =>
        val below = sorted.count(_ < x); val cnt = sorted.count(_ == x)
        x -> (below + (cnt + 1) / 2.0)
      }.toMap
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      (n * sab - sa * sb) / (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rx, ry, rz) = (avgRanks(xs), avgRanks(ys), avgRanks(zs))
    val want = Map(
      ("x", "y") -> pearson(xs.map(rx), ys.map(ry)),
      ("x", "z") -> pearson(xs.map(rx), zs.map(rz)),
      ("y", "z") -> pearson(ys.map(ry), zs.map(rz)))
    val got = Association.spearmanMatrix(
        rows.toDF("x", "y", "z").repartition(7), Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    want.foreach { case (k, v) => got(k) shouldBe v +- 1e-9 }
    // strong monotone pair ranks high, independent pair near zero
    got(("x", "y")) should be > 0.9
    math.abs(got(("x", "z"))) should be < 0.2
    // constant column: NULL rho, not NaN/crash
    val const = Association.spearmanMatrix(
      Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b"), Seq("a", "b"))
    const.head().isNullAt(3) shouldBe true
  }

  test("kendallTau equals the brute-force pair count, tie-corrected; cell cap enforced") {
    // mixed ties fixture, brute-forced driver-side
    val rows = Seq((1, 1), (1, 2), (2, 2), (2, 2), (3, 1), (3, 3), (4, 2), (4, 4))
      .map { case (a, b) => (a.toDouble, b.toDouble) }
    var c = 0L; var d = 0L
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val s = (rows(i)._1 - rows(j)._1) * (rows(i)._2 - rows(j)._2)
      if (s > 0) c += 1 else if (s < 0) d += 1
    }
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    def ties(vs: Seq[Double]) = vs.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val want = (c - d).toDouble /
      math.sqrt((n0 - ties(rows.map(_._1))).toDouble * (n0 - ties(rows.map(_._2))))
    val got = Association.kendallTau(rows.toDF("x", "y").repartition(3), "x", "y").head()
    got.getLong(0) shouldBe n
    got.getLong(2) shouldBe c
    got.getLong(3) shouldBe d
    got.getDouble(4) shouldBe want +- 1e-12
    // perfect concordance / discordance
    Association.kendallTau(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y"),
      "x", "y").head().getDouble(4) shouldBe 1.0 +- 1e-12
    Association.kendallTau(Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y"),
      "x", "y").head().getDouble(4) shouldBe -1.0 +- 1e-12
    // constant margin: NULL tau
    Association.kendallTau(Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y"), "x", "y")
      .head().isNullAt(4) shouldBe true
    // quadratic-blowup guard refuses loudly
    an[IllegalArgumentException] should be thrownBy
      Association.kendallTau((1 to 100).map(i => (i.toDouble, i.toDouble)).toDF("x", "y"),
        "x", "y", maxCells = 10)
  }

  test("bhAdjust equals the classic step-up rule") {
    // textbook fixture: m = 10 p-values, alpha = 0.05
    val ps = Seq(0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216)
    val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("k", "p")
    val got = Association.bhAdjust(df, "k", "p", alpha = 0.05)
      .orderBy("p_rank")
      .collect().map(r => (r.getDouble(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
    // hand model: adj(i) = min_{j>=i} p_j * m / j, capped at 1
    val m = ps.size
    val want = ps.indices.map { i =>
      (i until m).map(j => math.min(1.0, ps(j) * m / (j + 1))).min
    }
    got.map(_._1) shouldBe ps // rank order is p order
    got.map(_._2) shouldBe (1 to m)
    got.map(_._3).zip(want).foreach { case (g, w) => g shouldBe w +- 1e-12 }
    // step-up at alpha 0.05: k = 2 (p(2)=0.008 <= 2*0.05/10, p(3)=0.039
    // > 3*0.05/10 and no later rank passes), and rejection == adj <= alpha
    got.map(_._4).toSeq shouldBe got.map(_._3 <= 0.05).toSeq
    got.count(_._4) shouldBe 2
  }

  test("mantelHaenszel pools strata to the textbook common OR and CMH statistic") {
    // two strata, both OR = 4: S1 a=10 b=5 c=5 d=10, S2 a=20 b=10 c=10 d=20
    val rows =
      Seq.fill(10)(("s1", 1, 1)) ++ Seq.fill(5)(("s1", 1, 0)) ++
      Seq.fill(5)(("s1", 0, 1)) ++ Seq.fill(10)(("s1", 0, 0)) ++
      Seq.fill(20)(("s2", 1, 1)) ++ Seq.fill(10)(("s2", 1, 0)) ++
      Seq.fill(10)(("s2", 0, 1)) ++ Seq.fill(20)(("s2", 0, 0))
    val r = Association.mantelHaenszel(
      rows.toDF("s", "e", "o").repartition(4), "s", "e", "o").head()
    r.getAs[Long]("n_strata") shouldBe 2L
    r.getAs[Long]("n") shouldBe 90L
    r.getAs[Long]("sum_a") shouldBe 30L
    r.getAs[Double]("or_mh") shouldBe 4.0 +- 1e-12
    // E1 = 15*15/30, V1 = 15^4/(30^2*29); E2 = 30*30/60, V2 = 30^4/(60^2*59)
    val esum = 7.5 + 15.0
    val vsum = 50625.0 / 26100.0 + 810000.0 / 212400.0
    r.getAs[Double]("cmh_stat") shouldBe
      ((30.0 - esum) * (30.0 - esum) / vsum) +- 1e-9
  }

  test("mantelHaenszel drops n_k<2 strata, nulls, and degenerate denominators") {
    // a singleton stratum must not enter any sum; a null stratum is excluded
    val rows = Seq(("tiny", 1, 1), (null, 1, 0)) ++
      Seq.fill(4)(("s", 1, 1)) ++ Seq.fill(4)(("s", 0, 0))
    val r = Association.mantelHaenszel(
      rows.toDF("s", "e", "o"), "s", "e", "o").head()
    r.getAs[Long]("n_strata") shouldBe 1L
    r.getAs[Long]("n") shouldBe 8L
    // b = c = 0 in the surviving stratum: discordant denominator is 0 -> NULL
    r.isNullAt(r.fieldIndex("or_mh")) shouldBe true
  }

  test("riskRatios reproduces the textbook 2x2 effect sizes and Wald intervals") {
    val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(80)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(90)((0, 0))
    val r = Association.riskRatios(rows.toDF("e", "o").repartition(3), "e", "o").head()
    r.getAs[Long]("n") shouldBe 200L
    r.getAs[Long]("a") shouldBe 20L
    r.getAs[Double]("odds_ratio") shouldBe 2.25 +- 1e-12
    r.getAs[Double]("risk_ratio") shouldBe 2.0 +- 1e-12
    r.getAs[Double]("risk_diff") shouldBe 0.1 +- 1e-12
    val z = 1.959963984540054
    val seOr = math.sqrt(1.0 / 20 + 1.0 / 80 + 1.0 / 10 + 1.0 / 90)
    r.getAs[Double]("or_lo") shouldBe math.exp(math.log(2.25) - z * seOr) +- 1e-9
    r.getAs[Double]("or_hi") shouldBe math.exp(math.log(2.25) + z * seOr) +- 1e-9
    val seRr = math.sqrt(80.0 / (20.0 * 100) + 90.0 / (10.0 * 100))
    r.getAs[Double]("rr_lo") shouldBe math.exp(math.log(2.0) - z * seRr) +- 1e-9
    val seRd = math.sqrt(0.2 * 0.8 / 100 + 0.1 * 0.9 / 100)
    r.getAs[Double]("rd_hi") shouldBe (0.1 + z * seRd) +- 1e-9
  }

  test("riskRatios: a zero cell nulls OR and its CI but leaves the census intact") {
    val rows = Seq.fill(5)((1, 1)) ++ Seq.fill(5)((0, 1)) ++ Seq.fill(5)((0, 0))
    val r = Association.riskRatios(rows.toDF("e", "o"), "e", "o").head()
    r.getAs[Long]("b") shouldBe 0L
    r.isNullAt(r.fieldIndex("odds_ratio")) shouldBe true
    r.isNullAt(r.fieldIndex("or_lo")) shouldBe true
    // RR is still defined (a > 0, c > 0): p1 = 1.0, p0 = 0.5
    r.getAs[Double]("risk_ratio") shouldBe 2.0 +- 1e-12
  }

  test("partialCorrelation recovers the recursion formula and nulls on |r|=1 controls") {
    // y = x + z with x, z chosen non-collinear; expected from the raw sums
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val zs = Seq(2.0, 1.0, 4.0, 3.0, 6.0, 5.0)
    val ys = xs.zip(zs).map { case (a, b) => a + 2.0 * b }
    def pearson(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.size.toDouble
      val num = n * u.zip(v).map { case (a, b) => a * b }.sum - u.sum * v.sum
      val den = math.sqrt(n * u.map(a => a * a).sum - u.sum * u.sum) *
        math.sqrt(n * v.map(a => a * a).sum - v.sum * v.sum)
      num / den
    }
    val (rxy, rxz, ryz) = (pearson(xs, ys), pearson(xs, zs), pearson(ys, zs))
    val expected = (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
    val df = xs.indices.map(i => (xs(i), ys(i), zs(i))).toDF("x", "y", "z")
    val r = Association.partialCorrelation(df.repartition(3), "x", "y", "z").head()
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Double]("r_xy") shouldBe rxy +- 1e-9
    r.getAs[Double]("r_partial") shouldBe expected +- 1e-9
    // x == z: r_xz = 1 makes the partial denominator 0 -> NULL
    val degenerate = xs.indices.map(i => (xs(i), ys(i), xs(i))).toDF("x", "y", "z")
    val rd = Association.partialCorrelation(degenerate, "x", "y", "z").head()
    rd.isNullAt(rd.fieldIndex("r_partial")) shouldBe true
  }

  test("welchT reproduces the unequal-variance statistic and Satterthwaite dof") {
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++ Seq(10.0, 20.0).map(("B", _))
    val r = Association.welchT(rows.toDF("g", "x").repartition(3), "g", "x").head()
    r.getAs[String]("group_a") shouldBe "A"
    r.getAs[String]("group_b") shouldBe "B"
    r.getAs[Long]("n_groups") shouldBe 2L
    r.getAs[Double]("mean_a") shouldBe 2.5 +- 1e-12
    r.getAs[Double]("mean_b") shouldBe 15.0 +- 1e-12
    val va = 5.0 / 3.0; val vb = 50.0
    val se2 = va / 4.0 + vb / 2.0
    r.getAs[Double]("t_stat") shouldBe ((2.5 - 15.0) / math.sqrt(se2)) +- 1e-9
    val dof = se2 * se2 /
      ((va / 4.0) * (va / 4.0) / 3.0 + (vb / 2.0) * (vb / 2.0) / 1.0)
    r.getAs[Double]("dof") shouldBe dof +- 1e-9
  }

  test("welchT nulls the statistic off the 2-group contract") {
    val three = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 3.0), ("C", 9.0), ("C", 1.0))
    val r3 = Association.welchT(three.toDF("g", "x"), "g", "x").head()
    r3.getAs[Long]("n_groups") shouldBe 3L
    r3.isNullAt(r3.fieldIndex("t_stat")) shouldBe true
    // a singleton side has no variance estimate
    val single = Seq(("A", 1.0), ("A", 2.0), ("B", 7.0))
    val rs = Association.welchT(single.toDF("g", "x"), "g", "x").head()
    rs.isNullAt(rs.fieldIndex("t_stat")) shouldBe true
  }

  test("pairedT: the one-sample t of differences, degenerate variance nulls it") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("pre", "post")
    val r = Association.pairedT(df.repartition(2), "pre", "post").head()
    r.getAs[Long]("n") shouldBe 3L
    r.getAs[Double]("mean_diff") shouldBe 2.0 +- 1e-12
    r.getAs[Double]("sd_diff") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("t_stat") shouldBe (2.0 / (1.0 / math.sqrt(3.0))) +- 1e-9
    r.getAs[Long]("dof") shouldBe 2L
    // constant shift: sd = 0, t undefined, mean still reported
    val const = Seq((1.0, 2.0), (5.0, 6.0)).toDF("pre", "post")
    val rc = Association.pairedT(const, "pre", "post").head()
    rc.getAs[Double]("mean_diff") shouldBe 1.0 +- 1e-12
    rc.isNullAt(rc.fieldIndex("t_stat")) shouldBe true
  }

  test("bartlett: hand trace, equal variances near 0, degenerate group nulls") {
    // a: var 1, b: var 4, both n=3 -> Sp2 = 2.5, C = 1.25
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0))
    val r = Association.bartlett(rows.toDF("g", "v").repartition(2), "g", "v").head()
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Long]("n") shouldBe 6L
    val expected = (4.0 * math.log(2.5) - (2.0 * math.log(1.0) + 2.0 * math.log(4.0))) / 1.25
    r.getAs[Double]("chi2") shouldBe expected +- 1e-9
    r.getAs[Long]("dof") shouldBe 1L
    // identical spreads -> chi2 exactly 0
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
    Association.bartlett(eq.toDF("g", "v"), "g", "v").head()
      .getAs[Double]("chi2") shouldBe 0.0 +- 1e-12
    // a singleton group (n=1) makes the statistic undefined
    val deg = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0))
    val rd = Association.bartlett(deg.toDF("g", "v"), "g", "v").head()
    rd.isNullAt(rd.fieldIndex("chi2")) shouldBe true
  }

  test("cochranQ: hand trace, k=2 equals McNemar's uncorrected chi2, degenerate null") {
    // C = (3,3,1), T = 7, sumR2 = 15 -> Q = 2*(3*19 - 49)/(21 - 15)
    val rows = Seq((1L, 1L, 0L), (1L, 1L, 1L), (0L, 1L, 0L), (1L, 0L, 0L))
    val r = Association.cochranQ(rows.toDF("t1", "t2", "t3").repartition(2),
      Seq("t1", "t2", "t3")).head()
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Long]("k") shouldBe 3L
    r.getAs[Long]("t_total") shouldBe 7L
    r.getAs[Double]("q_stat") shouldBe (16.0 / 6.0) +- 1e-12
    r.getAs[Long]("dof") shouldBe 2L
    // k = 2: b = 3 discordant one way, c = 1 the other -> (b-c)^2/(b+c)
    val two = Seq((1L, 0L), (1L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (1L, 1L), (0L, 0L))
    val q2 = Association.cochranQ(two.toDF("p1", "p2"), Seq("p1", "p2")).head()
    q2.getAs[Double]("q_stat") shouldBe 1.0 +- 1e-12
    // every subject constant across treatments -> denominator 0 -> null
    val const = Seq((1L, 1L, 1L), (0L, 0L, 0L))
    val qc = Association.cochranQ(const.toDF("t1", "t2", "t3"),
      Seq("t1", "t2", "t3")).head()
    qc.isNullAt(qc.fieldIndex("q_stat")) shouldBe true
  }

  test("cuped: perfectly correlated covariate removes all variance, means keep expectation") {
    // y = 3x exactly -> pooled theta = 3, var_cuped = 0, reduction = 1;
    // mean_cuped_g = mean_y_g - 3 (mean_x_g - xbar_pool)
    val rows = Seq(("a", 3.0, 1.0), ("a", 6.0, 2.0), ("a", 9.0, 3.0),
      ("b", 12.0, 4.0), ("b", 15.0, 5.0), ("b", 18.0, 6.0))
    val r = Association.cuped(rows.toDF("g", "y", "x").repartition(3), "g", "y", "x")
      .orderBy("g").collect()
    val xbar = 3.5
    val a = r(0)
    a.getAs[Long]("n") shouldBe 3L
    a.getAs[Double]("mean_y") shouldBe 6.0 +- 1e-9
    a.getAs[Double]("mean_cuped") shouldBe (6.0 - 3.0 * (2.0 - xbar)) +- 1e-9
    a.getAs[Double]("var_cuped") shouldBe 0.0 +- 1e-9
    a.getAs[Double]("var_reduction") shouldBe 1.0 +- 1e-9
    val b = r(1)
    b.getAs[Double]("mean_cuped") shouldBe (15.0 - 3.0 * (5.0 - xbar)) +- 1e-9
    // the adjusted means collapse toward each other: that IS the
    // variance-reduction story (group means differ only through x)
    math.abs(a.getAs[Double]("mean_cuped") - b.getAs[Double]("mean_cuped")) should be < 1e-9
  }

  test("cuped: constant covariate leaves metric untouched (theta undefined -> nulls)") {
    val rows = Seq(("a", 1.0, 5.0), ("a", 3.0, 5.0), ("b", 2.0, 5.0))
    val r = Association.cuped(rows.toDF("g", "y", "x"), "g", "y", "x")
      .orderBy("g").collect()
    r(0).getAs[Double]("mean_y") shouldBe 2.0 +- 1e-12
    r(0).isNullAt(r(0).fieldIndex("mean_cuped")) shouldBe true
    r(0).getAs[Double]("var_y") shouldBe 2.0 +- 1e-12
    // n = 1 group: variance columns null, mean reported
    r(1).getAs[Double]("mean_y") shouldBe 2.0 +- 1e-12
    r(1).isNullAt(r(1).fieldIndex("var_y")) shouldBe true
  }

  test("cuped: uncorrelated covariate reduces nothing (theta = 0)") {
    // x symmetric around its mean within each y level -> cov = 0
    val rows = Seq(("a", 1.0, 1.0), ("a", 1.0, 3.0), ("a", 5.0, 1.0), ("a", 5.0, 3.0))
    val r = Association.cuped(rows.toDF("g", "y", "x"), "g", "y", "x").head()
    r.getAs[Double]("mean_cuped") shouldBe r.getAs[Double]("mean_y") +- 1e-12
    r.getAs[Double]("var_cuped") shouldBe r.getAs[Double]("var_y") +- 1e-12
    r.getAs[Double]("var_reduction") shouldBe 0.0 +- 1e-12
  }

  test("ols2: recovers exact planted coefficients and r2 = 1") {
    // y = 2 + 3*x1 - 4*x2 exactly; x1, x2 not collinear
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (2.0, 1.0), (1.0, 3.0), (4.0, 2.0))
    val rows = pts.map { case (x1, x2) => ("g", x1, x2, 2.0 + 3.0 * x1 - 4.0 * x2) }
    val r = Association.ols2(rows.toDF("g", "x1", "x2", "y").repartition(3),
      "g", "x1", "x2", "y").head()
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Double]("b0") shouldBe 2.0 +- 1e-9
    r.getAs[Double]("b1") shouldBe 3.0 +- 1e-9
    r.getAs[Double]("b2") shouldBe -4.0 +- 1e-9
    r.getAs[Double]("r2") shouldBe 1.0 +- 1e-12
  }

  test("ols2: collinear predictors yield null coefficients; noise r2 < 1; null rows drop") {
    // x2 = 2*x1 -> det = 0
    val col2 = (1 to 8).map(i => ("g", i.toDouble, 2.0 * i, i * 1.5 + 1))
    val c = Association.ols2(col2.toDF("g", "x1", "x2", "y"), "g", "x1", "x2", "y").head()
    c.isNullAt(2) shouldBe true
    c.isNullAt(3) shouldBe true
    c.isNullAt(5) shouldBe true
    // independent noise on y keeps 0 < r2 < 1; a null row is dropped
    val seed = new scala.util.Random(7)
    val noisy = (1 to 50).map { i =>
      val (x1, x2) = (i.toDouble, ((i * 13) % 17).toDouble)
      ("g", Option(x1), x2, 5.0 + 0.5 * x1 - 2.0 * x2 + seed.nextGaussian())
    } :+ (("g", None: Option[Double], 1.0, 99.0))
    val n = Association.ols2(noisy.toDF("g", "x1", "x2", "y"), "g", "x1", "x2", "y").head()
    n.getAs[Long]("n") shouldBe 50L
    val r2 = n.getAs[Double]("r2")
    r2 should be > 0.9
    r2 should be < 1.0
    n.getAs[Double]("b1") shouldBe 0.5 +- 0.1
    n.getAs[Double]("b2") shouldBe -2.0 +- 0.1
  }
}
