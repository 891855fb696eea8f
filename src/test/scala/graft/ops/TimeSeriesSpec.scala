package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TimeSeriesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("acf matches the hand-traced ramp at every lag") {
    // x = 1,2,3,4: mean 2.5, den 5; r1 = 1.25/5, r2 = -1.5/5, r3 = -2.25/5
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0))
      .toDF("k", "t", "x")
    val rows = TimeSeries.acf(df.repartition(3), "k", "t", "x", maxLag = 3)
      .orderBy("lag").collect()
    rows.map(_.getAs[Int]("lag")).toSeq shouldBe Seq(1, 2, 3)
    rows.map(_.getAs[Long]("n_pairs")).toSeq shouldBe Seq(3L, 2L, 1L)
    rows(0).getAs[Double]("acf") shouldBe 0.25 +- 1e-12
    rows(1).getAs[Double]("acf") shouldBe -0.3 +- 1e-12
    rows(2).getAs[Double]("acf") shouldBe -0.45 +- 1e-12
  }

  test("acf keys series independently and nulls out constant series") {
    val df = (Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 1.0), ("a", 4L, 2.0)) ++
      (1 to 4).map(i => ("c", i.toLong, 7.0))).toDF("k", "t", "x")
    val byKey = TimeSeries.acf(df, "k", "t", "x", maxLag = 1)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    // alternating series: dev = -.5,.5,-.5,.5, den 1, num lag1 = -0.75
    byKey("a").getAs[Double]("acf") shouldBe -0.75 +- 1e-12
    byKey("c").isNullAt(byKey("c").fieldIndex("acf")) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.acf(df, "k", "t", "x", 0)
  }

  test("decompose recovers an exact linear trend + zero-sum seasonal (odd period)") {
    // x = (10 + 2t) + s(phase), s = (3, -1, -2): MA_3 kills the seasonal
    val s = Array(3.0, -1.0, -2.0)
    val df = (1 to 9).map(t => ("a", t.toLong, 10.0 + 2 * t + s((t - 1) % 3)))
      .toDF("k", "t", "x")
    val rows = TimeSeries.decompose(df.repartition(4), "k", "t", "x", period = 3)
      .orderBy("t").collect()
    rows.length shouldBe 9
    rows(0).isNullAt(rows(0).fieldIndex("trend")) shouldBe true
    rows(8).isNullAt(rows(8).fieldIndex("trend")) shouldBe true
    for (i <- 1 to 7) {
      rows(i).getAs[Double]("trend") shouldBe (10.0 + 2 * (i + 1)) +- 1e-12
      rows(i).getAs[Double]("residual") shouldBe 0.0 +- 1e-12
    }
    for (i <- 0 to 8)
      rows(i).getAs[Double]("seasonal") shouldBe s(i % 3) +- 1e-12
  }

  test("decompose even period uses the half-weight 2xp moving average") {
    // alternating +-1: interior trend (x_t + (x_{t-1}+x_{t+1})/2)/2 = 0
    val df = (1 to 10).map(t => ("a", t.toLong, if (t % 2 == 1) 1.0 else -1.0))
      .toDF("k", "t", "x")
    val rows = TimeSeries.decompose(df, "k", "t", "x", period = 2)
      .orderBy("t").collect()
    rows(0).isNullAt(rows(0).fieldIndex("trend")) shouldBe true
    for (i <- 1 to 8) {
      rows(i).getAs[Double]("trend") shouldBe 0.0 +- 1e-12
      rows(i).getAs[Double]("residual") shouldBe 0.0 +- 1e-12
    }
    rows(2).getAs[Double]("seasonal") shouldBe 1.0 +- 1e-12
    rows(3).getAs[Double]("seasonal") shouldBe -1.0 +- 1e-12
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.decompose(df, "k", "t", "x", 1)
  }

  test("transitionMatrix counts bigrams per entity and row-normalizes") {
    val df = Seq((1L, 1L, 0L, "A"), (1L, 2L, 0L, "B"), (1L, 3L, 0L, "A"),
      (1L, 4L, 0L, "B"), (2L, 1L, 0L, "A"), (2L, 2L, 0L, "A"))
      .toDF("u", "t", "id", "s")
    val m = TimeSeries.transitionMatrix(df.repartition(3), "u", "t", "s", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    m(("A", "B")) shouldBe (2L, 2.0 / 3.0)
    m(("A", "A")) shouldBe (1L, 1.0 / 3.0)
    m(("B", "A")) shouldBe (1L, 1.0)
    m.size shouldBe 3
    // equal timestamps: the tie column pins the sequence
    val tied = Seq((1L, 5L, 1L, "X"), (1L, 5L, 2L, "Y")).toDF("u", "t", "id", "s")
    TimeSeries.transitionMatrix(tied, "u", "t", "s", "id")
      .head().getString(0) shouldBe "X"
  }

  test("crossCorrelation finds the lead-lag structure of a shifted alternation") {
    // y_t = x_{t+1} = -x_t on a +-1 alternation: r(0) = -1, r(+-1) = 7/8
    val df = (1 to 8).map { t =>
      val x = if (t % 2 == 1) 1.0 else -1.0
      ("s", t.toLong, x, -x)
    }.toDF("k", "t", "x", "y")
    val rows = TimeSeries.crossCorrelation(df.repartition(5), "k", "t", "x", "y", 1)
      .orderBy("lag").collect()
    rows.map(_.getAs[Int]("lag")).toSeq shouldBe Seq(-1, 0, 1)
    rows.map(_.getAs[Long]("n_pairs")).toSeq shouldBe Seq(7L, 8L, 7L)
    rows(1).getAs[Double]("ccf") shouldBe -1.0 +- 1e-12
    rows(0).getAs[Double]("ccf") shouldBe (7.0 / 8.0) +- 1e-12
    rows(2).getAs[Double]("ccf") shouldBe (7.0 / 8.0) +- 1e-12
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.crossCorrelation(df, "k", "t", "x", "y", 0)
  }

  test("a pure period-2 signal has acf -1 at lag 1 and +1-ish at lag 2") {
    val df = (0 until 40).map(i => ("s", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("k", "t", "x")
    val rows = TimeSeries.acf(df.repartition(7), "k", "t", "x", 2)
      .orderBy("lag").collect()
    rows(0).getAs[Double]("acf") shouldBe -(39.0 / 40.0) +- 1e-12
    rows(1).getAs[Double]("acf") shouldBe (38.0 / 40.0) +- 1e-12
  }

  test("cusum locates a level shift and normalizes by sigma*sqrt(n)") {
    // x = 0,0,0,10,10: S_t = -4,-8,-12,-6,0 -> max|S| = 12 at t = 3
    val df = Seq(("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 0.0),
      ("a", 4L, 10.0), ("a", 5L, 10.0),
      ("c", 1L, 7.0), ("c", 2L, 7.0)) // constant -> stat NULL
      .toDF("k", "t", "x")
    val by = TimeSeries.cusum(df.repartition(3), "k", "t", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    by("a").getAs[Long]("cp_index") shouldBe 3L
    by("a").getAs[Long]("cp_time") shouldBe 3L
    by("a").getAs[Double]("s_max") shouldBe 12.0 +- 1e-12
    by("a").getAs[Double]("stat") shouldBe
      12.0 / (math.sqrt(24.0) * math.sqrt(5.0)) +- 1e-12
    by("c").isNullAt(by("c").fieldIndex("stat")) shouldBe true
    // tied criterion (x = 1, 0, -1 has |S_1| = |S_2|) -> first index wins
    val tied = Seq(("t", 1L, 1.0), ("t", 2L, 0.0), ("t", 3L, -1.0))
      .toDF("k", "t", "x")
    TimeSeries.cusum(tied, "k", "t", "x").head()
      .getAs[Long]("cp_index") shouldBe 1L
  }

  test("trend recovers a perfect line and NULLs degenerate fits") {
    // y = 2x + 1 over positions 1..5; constant series; singleton
    val df = (1 to 5).map(t => ("a", t.toLong, 2.0 * t + 1.0)) ++
      (1 to 4).map(t => ("c", t.toLong, 7.0)) ++ Seq(("s", 1L, 3.0))
    val by = TimeSeries.trend(df.toDF("k", "t", "x").repartition(3), "k", "t", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    by("a").getAs[Double]("slope") shouldBe 2.0 +- 1e-12
    by("a").getAs[Double]("intercept") shouldBe 1.0 +- 1e-12
    by("a").getAs[Double]("r2") shouldBe 1.0 +- 1e-12
    by("c").getAs[Double]("slope") shouldBe 0.0 +- 1e-12
    by("c").getAs[Double]("intercept") shouldBe 7.0 +- 1e-12
    by("c").isNullAt(by("c").fieldIndex("r2")) shouldBe true
    by("s").isNullAt(by("s").fieldIndex("slope")) shouldBe true
    // hand trace, non-trivial: y = (3, 1, 4) -> slope 0.5, r2 = 1/14... no:
    // x=(1,2,3), cov*n = 3*17 - 6*8 = 3, var_x*n = 3*14 - 36 = 6 -> 0.5;
    // var_y*n = 3*26 - 64 = 14 -> r2 = 9/84
    val h = TimeSeries.trend(Seq(("h", 1L, 3.0), ("h", 2L, 1.0), ("h", 3L, 4.0))
      .toDF("k", "t", "x"), "k", "t", "x").head()
    h.getAs[Double]("slope") shouldBe 0.5 +- 1e-12
    h.getAs[Double]("r2") shouldBe (9.0 / 84.0) +- 1e-12
  }

  test("interArrival takes gaps within each entity stream, not across") {
    // key a / user 1: 0,2,5 -> gaps 2,3; user 2: 10,14 -> gap 4
    val df = Seq(("a", 1L, 0L, 1L), ("a", 1L, 2L, 2L), ("a", 1L, 5L, 3L),
      ("a", 2L, 10L, 4L), ("a", 2L, 14L, 5L),
      ("b", 9L, 0L, 6L)) // singleton stream -> no pairs -> key absent
      .toDF("k", "u", "sec", "id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val rows = TimeSeries.interArrival(df.repartition(3), "k", "u", "ts", "id")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    rows.keySet shouldBe Set("a")
    rows("a").getAs[Long]("n_pairs") shouldBe 3L
    rows("a").getAs[Double]("mean_gap_s") shouldBe 3.0 +- 1e-12
    rows("a").getAs[Double]("min_gap_s") shouldBe 2.0 +- 1e-12
    rows("a").getAs[Double]("max_gap_s") shouldBe 4.0 +- 1e-12
    // equal timestamps: the tie column pins order, gap 0 is a real pair
    val tied = Seq(("t", 1L, 7L, 1L), ("t", 1L, 7L, 2L))
      .toDF("k", "u", "sec", "id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    TimeSeries.interArrival(tied, "k", "u", "ts", "id")
      .head().getAs[Double]("min_gap_s") shouldBe 0.0 +- 1e-12
  }

  test("theilSen shrugs off the outlier OLS is dragged by") {
    val pts = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 100.0))
      .map { case (x, y) => ("k", x, y) }
    val df = pts.toDF("k", "x", "y").repartition(3)
    val sen = TimeSeries.theilSen(df, "k", "x", "y").head()
    sen.getAs[Long]("n_points") shouldBe 5L
    sen.getAs[Long]("n_pairs") shouldBe 10L
    // 6 of 10 pairwise slopes are exactly 1; the median sits on them
    sen.getAs[Double]("sen_slope") shouldBe 1.0 +- 1e-12
    val ols = TimeSeries.trend(df, "k", "x", "y").head().getAs[Double]("slope")
    ols should be > 10.0
  }

  test("theilSen collapses duplicate x to the mean and enforces maxPoints") {
    val df = Seq(("k", 1.0, 0.0), ("k", 1.0, 2.0), ("k", 2.0, 3.0)).toDF("k", "x", "y")
    val r = TimeSeries.theilSen(df, "k", "x", "y").head()
    r.getAs[Long]("n_points") shouldBe 2L
    r.getAs[Long]("n_pairs") shouldBe 1L
    // (3 - mean(0,2)) / (2 - 1) = 2
    r.getAs[Double]("sen_slope") shouldBe 2.0 +- 1e-12
    an[IllegalArgumentException] should be thrownBy TimeSeries.theilSen(
      (1 to 10).map(i => ("k", i.toDouble, 1.0)).toDF("k", "x", "y"),
      "k", "x", "y", maxPoints = 4).head()
  }

  test("seasonalStrength: strong seasonality scores near 1, flat trend near 0") {
    // hand-built decomposition: constant trend, alternating seasonal,
    // tiny residual; null-trend edge rows must be excluded
    val rows = (0 until 8).map { i =>
      val s = if (i % 2 == 0) 2.0 else -2.0
      val r = if (i % 2 == 0) 0.1 else -0.1
      ("k", Some(10.0), s, r)
    } :+ (("k", None: Option[Double], 9.9, 0.5))
    val df = rows.toDF("event_type", "trend", "seasonal", "residual")
    val got = TimeSeries.seasonalStrength(df.repartition(3), "event_type").head()
    got.getAs[Long]("n") shouldBe 8L
    def sampleVar(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val rs = (0 until 8).map(i => if (i % 2 == 0) 0.1 else -0.1)
    val srs = (0 until 8).map(i => if (i % 2 == 0) 2.1 else -2.1)
    val expSeasonal = math.max(0.0, 1.0 - sampleVar(rs) / sampleVar(srs))
    got.getAs[Double]("f_seasonal") shouldBe expSeasonal +- 1e-9
    // trend + residual is just the residual shifted: F_trend clamps to 0
    got.getAs[Double]("f_trend") shouldBe 0.0 +- 1e-12
  }

  test("changePoint finds the planted step; symmetric ties pick the earliest boundary") {
    // y = 1,1,1,5,5,5 -> split after x=3: |1-5|*sqrt(9/6)
    val step = (1 to 6).map(i => ("k", i.toDouble, if (i <= 3) 1.0 else 5.0))
    val r = TimeSeries.changePoint(step.toDF("k", "x", "y").repartition(3),
      "k", "x", "y").head()
    r.getAs[Long]("n_points") shouldBe 6L
    r.getAs[Double]("split_x") shouldBe 3.0 +- 1e-12
    r.getAs[Double]("mean_left") shouldBe 1.0 +- 1e-12
    r.getAs[Double]("mean_right") shouldBe 5.0 +- 1e-12
    r.getAs[Double]("stat") shouldBe (4.0 * math.sqrt(1.5)) +- 1e-12
    // y = 0,10,0: boundaries t=1 and t=2 score identically -> earliest x
    val tie = Seq(("k", 1.0, 0.0), ("k", 2.0, 10.0), ("k", 3.0, 0.0))
    TimeSeries.changePoint(tie.toDF("k", "x", "y"), "k", "x", "y").head()
      .getAs[Double]("split_x") shouldBe 1.0 +- 1e-12
    // duplicate x values collapse to their MEAN (the theilSen /
    // mannKendall census convention), never their sum: two y=1 rows at
    // each left x must leave the step means exactly 1 -> 5
    val dup = step ++ (1 to 3).map(i => ("k", i.toDouble, 1.0))
    val d = TimeSeries.changePoint(dup.toDF("k", "x", "y"), "k", "x", "y").head()
    d.getAs[Double]("mean_left") shouldBe 1.0 +- 1e-12
    d.getAs[Double]("mean_right") shouldBe 5.0 +- 1e-12
    d.getAs[Double]("split_x") shouldBe 3.0 +- 1e-12
  }

  test("mannKendall: hand-computed S, tie-corrected variance, continuity-corrected Z") {
    // y = 1,3,2,4,5 -> S = 8; no ties: Var = 5*4*15/18; Z = 7/sqrt(Var)
    val up = (0 to 4).map(i => ("k", i.toDouble, Seq(1.0, 3.0, 2.0, 4.0, 5.0)(i)))
    val r = TimeSeries.mannKendall(up.toDF("k", "x", "y").repartition(3),
      "k", "x", "y").head()
    r.getAs[Long]("n_points") shouldBe 5L
    r.getAs[Long]("s_stat") shouldBe 8L
    r.getAs[Double]("var_s") shouldBe (300.0 / 18.0) +- 1e-12
    r.getAs[Double]("z") shouldBe (7.0 / math.sqrt(300.0 / 18.0)) +- 1e-12
    // y = 1,2,2,3 -> S = 5; one tie group t=2: Var = (156 - 18)/18
    val tied = (0 to 3).map(i => ("k", i.toDouble, Seq(1.0, 2.0, 2.0, 3.0)(i)))
    val t = TimeSeries.mannKendall(tied.toDF("k", "x", "y"), "k", "x", "y").head()
    t.getAs[Long]("s_stat") shouldBe 5L
    t.getAs[Double]("var_s") shouldBe (138.0 / 18.0) +- 1e-12
    t.getAs[Double]("z") shouldBe (4.0 / math.sqrt(138.0 / 18.0)) +- 1e-12
  }

  test("mannKendall: constant series has Z null; duplicate x collapse to the mean") {
    val flat = (0 to 3).map(i => ("k", i.toDouble, 7.0))
    val f = TimeSeries.mannKendall(flat.toDF("k", "x", "y"), "k", "x", "y").head()
    f.getAs[Long]("s_stat") shouldBe 0L
    f.getAs[Double]("var_s") shouldBe 0.0 +- 1e-12
    f.isNullAt(f.fieldIndex("z")) shouldBe true
    // x = 0,0,1 with y = 1,3,10: census (0 -> 2), (1 -> 10); S = 1,
    // n = 2, Var = 2*1*9/18 = 1, Z = (1-1)/1 = 0
    val dup = Seq(("k", 0.0, 1.0), ("k", 0.0, 3.0), ("k", 1.0, 10.0))
    val d = TimeSeries.mannKendall(dup.toDF("k", "x", "y"), "k", "x", "y").head()
    d.getAs[Long]("n_points") shouldBe 2L
    d.getAs[Long]("s_stat") shouldBe 1L
    d.getAs[Double]("z") shouldBe 0.0 +- 1e-12
    val three = Seq(("k", 0.0, 1.0), ("k", 1.0, 3.0), ("k", 2.0, 10.0))
    an[IllegalArgumentException] should be thrownBy TimeSeries.mannKendall(
      three.toDF("k", "x", "y"), "k", "x", "y", maxPoints = 2)
  }

  test("mannKendall and theilSen return empty frames on fully-filtered input") {
    val allNull = Seq(("k", Option.empty[Double], Option.empty[Double]))
      .toDF("k", "x", "y")
    TimeSeries.mannKendall(allNull, "k", "x", "y").count() shouldBe 0L
    TimeSeries.theilSen(allNull, "k", "x", "y").count() shouldBe 0L
  }

  test("westernElectric: matches a brute-force rule evaluation; constant series is quiet") {
    // deterministic pseudo-random counts with a planted spike and a
    // planted 8-point high shelf
    val xs = Seq(10L, 12L, 9L, 11L, 10L, 50L, 10L, 9L, 11L, 10L,
      14L, 14L, 14L, 14L, 14L, 14L, 14L, 14L, 9L, 10L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("a", java.sql.Timestamp.valueOf(f"2026-01-01 ${i}%02d:00:00"), x) } ++
      (0 until 10).map(i => ("c", java.sql.Timestamp.valueOf(f"2026-01-01 ${i}%02d:00:00"), 7L))
    val out = TimeSeries.westernElectric(rows.toDF("k", "t", "x"), "k", "t", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    // brute force for series a
    val n = xs.size
    val mu = xs.sum.toDouble / n
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    val z = xs.map(x => (x - mu) / sd)
    def winCnt(i: Int, len: Int, p: Double => Boolean) =
      (math.max(0, i - len + 1) to i).count(j => p(z(j)))
    def sideCnt(i: Int, len: Int, up: Boolean) =
      (math.max(0, i - len + 1) to i).count(j =>
        if (up) xs(j) > mu else xs(j) < mu)
    val r1 = z.count(v => math.abs(v) > 3.0)
    val r2 = (0 until n).count(i =>
      winCnt(i, 3, _ > 2.0) >= 2 || winCnt(i, 3, _ < -2.0) >= 2)
    val r3 = (0 until n).count(i =>
      winCnt(i, 5, _ > 1.0) >= 4 || winCnt(i, 5, _ < -1.0) >= 4)
    val r4 = (0 until n).count(i =>
      sideCnt(i, 8, up = true) == 8 || sideCnt(i, 8, up = false) == 8)
    val a = out("a")
    a.getAs[Long]("n_points") shouldBe n.toLong
    a.getAs[Double]("mean") shouldBe mu +- 1e-12
    a.getAs[Double]("std") shouldBe sd +- 1e-12
    a.getAs[Long]("r1_n") shouldBe r1.toLong
    a.getAs[Long]("r2_n") shouldBe r2.toLong
    a.getAs[Long]("r3_n") shouldBe r3.toLong
    a.getAs[Long]("r4_n") shouldBe r4.toLong
    r1 should be >= 1 // the planted spike must actually alarm
    r4 should be >= 1 // the planted shelf must actually alarm
    // constant series: no z (sd null), R4 needs STRICT sides -> silent
    val c = out("c")
    c.isNullAt(3) shouldBe true
    Seq("r1_n", "r2_n", "r3_n", "r4_n").foreach(c.getAs[Long](_) shouldBe 0L)
    c.isNullAt(8) shouldBe true
  }

  test("westernElectric: refuses a non-integral value column instead of truncating") {
    // a double series silently cast("long") would truncate toward zero and
    // produce plausible but wrong means/z-cuts — the doc's contract is
    // now enforced, not just documented
    val d = Seq(("a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1.5))
      .toDF("k", "t", "x")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.westernElectric(d, "k", "t", "x")
    }
    e.getMessage should include("integral")
  }
}
