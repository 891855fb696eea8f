package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EvaluationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rocAuc equals the brute-force pairwise probability, ties counting half") {
    // deterministic LCG scores with deliberate ties (scores snap to 1 dp)
    def lcg(seed: Long, n: Int): Seq[Long] = {
      var x = seed
      (1 to n).map { _ => x = (x * 48271) % 2147483647; x }
    }
    val pos = lcg(7L, 150).map(x => (x % 200).toDouble / 10.0 + 2.0)
    val neg = lcg(13L, 200).map(x => (x % 200).toDouble / 10.0)
    val df = (pos.map((_, 1L)) ++ neg.map((_, 0L))).toDF("s", "y")
    val out = Evaluation.rocAuc(df.repartition(11), "s", "y").head()
    val brute = (for (p <- pos; n <- neg) yield {
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    }).sum / (pos.size.toDouble * neg.size)
    out.getDouble(0) shouldBe brute +- 1e-12
    out.getLong(1) shouldBe 150L
    out.getLong(2) shouldBe 200L
  }

  test("rocAuc endpoints: perfect separation 1.0, reversed 0.0, identical 0.5") {
    val perfect = ((1 to 50).map(i => (i + 100.0, 1L)) ++
      (1 to 50).map(i => (i.toDouble, 0L))).toDF("s", "y")
    Evaluation.rocAuc(perfect, "s", "y").head().getDouble(0) shouldBe 1.0
    val reversed = ((1 to 50).map(i => (i.toDouble, 1L)) ++
      (1 to 50).map(i => (i + 100.0, 0L))).toDF("s", "y")
    Evaluation.rocAuc(reversed, "s", "y").head().getDouble(0) shouldBe 0.0
    // every score identical -> all ties -> 0.5 exactly
    val flat = ((1 to 30).map(_ => (5.0, 1L)) ++ (1 to 70).map(_ => (5.0, 0L))).toDF("s", "y")
    Evaluation.rocAuc(flat, "s", "y").head().getDouble(0) shouldBe 0.5
    // single-class input is a loud error
    an[IllegalArgumentException] should be thrownBy
      Evaluation.rocAuc((1 to 5).map(i => (i.toDouble, 1L)).toDF("s", "y"), "s", "y")
  }

  test("rocAuc is partition-count independent and ignores nulls") {
    val rows = (1 to 500).map(i => (Some((i * 37 % 101).toDouble), Some((i * 7 % 3 == 0).compare(false).toLong))) :+
      ((None: Option[Double], Some(1L))) :+ ((Some(1.0), None: Option[Long]))
    val df = rows.toDF("s", "y")
    val a = Evaluation.rocAuc(df.repartition(1), "s", "y").head()
    val b = Evaluation.rocAuc(df.repartition(29), "s", "y").head()
    a.getDouble(0) shouldBe b.getDouble(0)
    a.getLong(1) + a.getLong(2) shouldBe 500L // the two null rows dropped
  }

  test("confusionStats counts and ratios match the hand-computed fixture") {
    // 6 tp, 2 fp, 3 fn, 9 tn
    val df = (Seq.fill(6)((1L, 1L)) ++ Seq.fill(2)((1L, 0L)) ++
      Seq.fill(3)((0L, 1L)) ++ Seq.fill(9)((0L, 0L))).toDF("p", "y")
    val r = Evaluation.confusionStats(df, "p", "y").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((6L, 2L, 3L, 9L))
    r.getDouble(4) shouldBe 6.0 / 8.0
    r.getDouble(5) shouldBe 6.0 / 9.0
    r.getDouble(6) shouldBe 12.0 / 17.0
    r.getDouble(7) shouldBe 15.0 / 20.0
  }

  test("confusionStats: no-positive-prediction yields null precision, not a crash") {
    val df = Seq((0L, 1L), (0L, 0L)).toDF("p", "y")
    val r = Evaluation.confusionStats(df, "p", "y").head()
    r.isNullAt(4) shouldBe true // precision 0/0
    r.getDouble(5) shouldBe 0.0 // recall 0/1
  }

  test("ndcgAtK matches the hand-computed fixture and window formulation") {
    // one group, 5 items, k=3: scores rank ids 5,4,3,2,1
    val df = Seq(
      ("g", 50.0, 3.0, 5L), ("g", 40.0, 0.0, 4L), ("g", 30.0, 2.0, 3L),
      ("g", 20.0, 1.0, 2L), ("g", 10.0, 3.0, 1L)).toDF("grp", "s", "rel", "id")
    val r = Evaluation.ndcgAtK(df.repartition(4), "grp", "s", "rel", "id", 3).head()
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    // ranked rels (7, 0, 3); ideal top-3 rels (7, 7, 3) from rel sort
    val dcg = 7.0 / log2(2.0) + 0.0 / log2(3.0) + 3.0 / log2(4.0)
    val idcg = 7.0 / log2(2.0) + 7.0 / log2(3.0) + 3.0 / log2(4.0)
    r.getAs[Long]("n_items") shouldBe 5L
    r.getAs[Double]("dcg") shouldBe dcg +- 1e-12
    r.getAs[Double]("idcg") shouldBe idcg +- 1e-12
    r.getAs[Double]("ndcg") shouldBe (dcg / idcg) +- 1e-12
  }

  test("ndcgAtK: perfect ranking is 1.0, zero relevance is NULL, score ties break by id") {
    val perfect = (1 to 20).map(i => ("g", i.toDouble, i.toDouble, i.toLong))
      .toDF("grp", "s", "rel", "id")
    Evaluation.ndcgAtK(perfect, "grp", "s", "rel", "id", 5)
      .head().getAs[Double]("ndcg") shouldBe 1.0 +- 1e-12
    val zero = (1 to 5).map(i => ("g", i.toDouble, 0.0, i.toLong)).toDF("grp", "s", "rel", "id")
    Evaluation.ndcgAtK(zero, "grp", "s", "rel", "id", 3).head()
      .isNullAt(4) shouldBe true
    // all scores tie -> ranking is by id ASC deterministically: rels (2, 0)
    val ties = Seq(("g", 1.0, 2.0, 1L), ("g", 1.0, 0.0, 2L), ("g", 1.0, 3.0, 9L))
      .toDF("grp", "s", "rel", "id")
    val t = Evaluation.ndcgAtK(ties.repartition(3), "grp", "s", "rel", "id", 2).head()
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    t.getAs[Double]("dcg") shouldBe (3.0 / log2(2.0) + 0.0) +- 1e-12
  }

  test("rankingAtK: MRR and precision match the hand fixture, 0 when nothing relevant") {
    // ranked rels by score desc: (0, 0, 2, 1, 0) -> first rel at rank 3
    val df = Seq(
      ("g", 50.0, 0.0, 1L), ("g", 40.0, 0.0, 2L), ("g", 30.0, 2.0, 3L),
      ("g", 20.0, 1.0, 4L), ("g", 10.0, 0.0, 5L),
      ("h", 9.0, 0.0, 6L), ("h", 8.0, 0.0, 7L)).toDF("grp", "s", "rel", "id")
    val out = Evaluation.rankingAtK(df.repartition(3), "grp", "s", "rel", "id", 4)
      .orderBy("grp").collect()
    out(0).getAs[Double]("mrr") shouldBe (1.0 / 3.0) +- 1e-15
    out(0).getAs[Double]("precision") shouldBe 0.5 // 2 relevant in top-4
    out(1).getAs[Double]("mrr") shouldBe 0.0
    out(1).getAs[Double]("precision") shouldBe 0.0
    out(0).getAs[Long]("n_items") shouldBe 5L
  }

  test("calibrationBins: fixture bins, closed last bin, and the ECE identity") {
    // bin 0: p in {0.05 x 2}, y = (1, 0) -> conf 0.05, acc 0.5
    // bin 9: p in {0.95, 1.0}, y = (1, 1) -> conf 0.975, acc 1.0 (p=1.0 stays in bin 9)
    val df = Seq((0.05, 1L), (0.05, 0L), (0.95, 1L), (1.0, 1L)).toDF("p", "y")
    val out = Evaluation.calibrationBins(df.repartition(3), "p", "y", 10)
      .orderBy("bin").collect()
    out.map(_.getAs[Long]("bin")).toSeq shouldBe Seq(0L, 9L)
    out(0).getAs[Double]("conf") shouldBe 0.05 +- 1e-12
    out(0).getAs[Double]("acc") shouldBe 0.5
    out(1).getAs[Double]("conf") shouldBe 0.975 +- 1e-12
    out(1).getAs[Double]("acc") shouldBe 1.0
    val ece = (2.0 * math.abs(0.5 - 0.05) + 2.0 * math.abs(1.0 - 0.975)) / 4.0
    all(out.map(_.getAs[Double]("ece"))) shouldBe ece +- 1e-12
  }

  test("cohenKappa: perfect agreement 1, independence ~0, and the textbook 2x2") {
    val perfect = (1 to 30).map(i => (i % 3, i % 3)).toDF("a", "b")
    Evaluation.cohenKappa(perfect, "a", "b").head().getAs[Double]("kappa") shouldBe 1.0
    // the classic 2x2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    // po = 35/50; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val cells = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Evaluation.cohenKappa(cells.toDF("a", "b").repartition(7), "a", "b").head()
    r.getAs[Long]("n") shouldBe 50L
    r.getAs[Double]("p_o") shouldBe 0.7
    r.getAs[Double]("p_e") shouldBe 0.5
    r.getAs[Double]("kappa") shouldBe 0.4 +- 1e-12
    // both raters constant and equal -> pe = 1 -> kappa undefined (NULL)
    val const = (1 to 5).map(_ => ("x", "x")).toDF("a", "b")
    Evaluation.cohenKappa(const, "a", "b").head().isNullAt(3) shouldBe true
    // a label only one rater uses must still enter the other's marginal
    val asym = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("a", "b")
    val r2 = Evaluation.cohenKappa(asym, "a", "b").head()
    // rowN(a)=2 colN(a)=1, rowN(b)=1 colN(b)=2 -> pe_num = 2 + 2 = 4
    r2.getAs[Double]("p_e") shouldBe 4.0 / 9.0 +- 1e-12
  }

  test("fleissKappa matches the hand-computed 2-label fixture and validates rater counts") {
    // 4 items x 3 raters: votes (3,0), (2,1), (2,1), (0,3) for labels (a,b)
    // P_i = (9-3)/6, (5-3)/6, (5-3)/6, (9-3)/6 -> Pbar = 16/24 = 2/3
    // c_a = 7, c_b = 5 -> Pe = (49 + 25)/144
    val votes = (Seq.fill(3)((1L, "a")) ++
      Seq((2L, "a"), (2L, "a"), (2L, "b")) ++
      Seq((3L, "a"), (3L, "a"), (3L, "b")) ++
      Seq.fill(3)((4L, "b"))).toDF("item", "lab")
    val r = Evaluation.fleissKappa(votes.repartition(5), "item", "lab").head()
    r.getAs[Long]("n_items") shouldBe 4L
    r.getAs[Long]("n_raters") shouldBe 3L
    val pBar = 2.0 / 3.0
    val pE = 74.0 / 144.0
    r.getAs[Double]("p_bar") shouldBe pBar +- 1e-12
    r.getAs[Double]("p_e") shouldBe pE +- 1e-12
    r.getAs[Double]("kappa") shouldBe ((pBar - pE) / (1 - pE)) +- 1e-12
    // unequal rater counts are a loud error, not a silent wrong number
    val ragged = votes.union(Seq((1L, "b")).toDF("item", "lab"))
    an[IllegalArgumentException] should be thrownBy
      Evaluation.fleissKappa(ragged, "item", "lab")
    // unanimous single label -> pe = 1 -> kappa NULL
    val unanimous = (1 to 3).flatMap(i => Seq.fill(2)((i.toLong, "a"))).toDF("item", "lab")
    Evaluation.fleissKappa(unanimous, "item", "lab").head().isNullAt(4) shouldBe true
  }

  test("fleissKappaWide equals the long-format path and drops incomplete rows") {
    // the same 4-item fixture as the long-format test, pivoted wide
    val wide = Seq(
      ("a", "a", "a"), ("a", "a", "b"), ("a", "a", "b"), ("b", "b", "b"))
      .toDF("r1", "r2", "r3")
    val w = Evaluation.fleissKappaWide(wide.repartition(3), Seq("r1", "r2", "r3")).head()
    val votes = (Seq.fill(3)((1L, "a")) ++
      Seq((2L, "a"), (2L, "a"), (2L, "b")) ++
      Seq((3L, "a"), (3L, "a"), (3L, "b")) ++
      Seq.fill(3)((4L, "b"))).toDF("item", "lab")
    val l = Evaluation.fleissKappa(votes, "item", "lab").head()
    w.getAs[Long]("n_items") shouldBe l.getAs[Long]("n_items")
    w.getAs[Double]("p_bar") shouldBe l.getAs[Double]("p_bar") +- 1e-15
    w.getAs[Double]("p_e") shouldBe l.getAs[Double]("p_e") +- 1e-15
    w.getAs[Double]("kappa") shouldBe l.getAs[Double]("kappa") +- 1e-15
    // a null vote drops the whole row (constant-rater-count by construction)
    val ragged = wide.union(Seq((null.asInstanceOf[String], "a", "a")).toDF("r1", "r2", "r3"))
    Evaluation.fleissKappaWide(ragged, Seq("r1", "r2", "r3"))
      .head().getAs[Long]("n_items") shouldBe 4L
    an[IllegalArgumentException] should be thrownBy
      Evaluation.fleissKappaWide(wide, Seq("r1"))
  }

  test("probMetrics matches hand-traced Brier/log-loss and clamps hard 0/1") {
    // group a: (p=0.8,y=1), (p=0.2,y=0) -> brier = 0.04, ll = -ln(0.8)
    val df = Seq(("a", 0.8, 1L), ("a", 0.2, 0L), ("z", 0.0, 1L))
      .toDF("g", "p", "y")
    val by = Evaluation.probMetrics(df.repartition(3), "g", "p", "y")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    by("a").getAs[Double]("base_rate") shouldBe 0.5 +- 1e-15
    by("a").getAs[Double]("brier") shouldBe 0.04 +- 1e-12
    by("a").getAs[Double]("logloss") shouldBe -math.log(0.8) +- 1e-12
    // a confident wrong answer costs ln(1/eps), not infinity
    by("z").getAs[Double]("brier") shouldBe 1.0 +- 1e-12
    by("z").getAs[Double]("logloss") shouldBe -math.log(1e-15) +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      Evaluation.probMetrics(df, "g", "p", "y", eps = 0.7)
  }

  test("averagePrecision matches the hand-traced step sum with id tiebreak") {
    // ranked by score desc: y = 1,0,1 -> AP = (1/1 + 2/3) / 2 = 5/6
    val df = Seq(("g", 3.0, 1L, 1L), ("g", 2.0, 0L, 2L), ("g", 1.0, 1L, 3L),
      ("e", 9.0, 0L, 1L)) // no positives -> NULL
      .toDF("grp", "s", "y", "id")
    val by = Evaluation.averagePrecision(df.repartition(3), "grp", "s", "y", "id")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    by("g").getAs[Long]("n_pos") shouldBe 2L
    by("g").getAs[Double]("ap") shouldBe (5.0 / 6.0) +- 1e-15
    by("e").isNullAt(by("e").fieldIndex("ap")) shouldBe true
    // tied scores: id ASC decides -> positives at ranks 1,2 -> AP = 1
    val tied = Seq(("t", 1.0, 1L, 1L), ("t", 1.0, 1L, 2L), ("t", 1.0, 0L, 3L))
      .toDF("grp", "s", "y", "id")
    Evaluation.averagePrecision(tied, "grp", "s", "y", "id")
      .head().getAs[Double]("ap") shouldBe 1.0 +- 1e-15
  }

  test("prAuc matches the hand-computed trapezoid and anchors at (0,1)") {
    // thresholds desc: .9 -> (R=.5,P=1); .8 -> dR=0; .7 -> (R=1,P=2/3); .6 -> dR=0
    val df = Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.6, 0L)).toDF("s", "y")
    val r = Evaluation.prAuc(df.repartition(5), "s", "y").head()
    r.getAs[Double]("pr_auc") shouldBe (0.5 + 7.0 / 24.0) +- 1e-12
    r.getAs[Double]("baseline") shouldBe 0.5 +- 1e-15
    r.getAs[Long]("n_pos") shouldBe 2L
    r.getAs[Long]("n_neg") shouldBe 2L
    // perfect separation integrates to 1
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)).toDF("s", "y")
    Evaluation.prAuc(perfect, "s", "y").head()
      .getAs[Double]("pr_auc") shouldBe 1.0 +- 1e-12
    an[Exception] should be thrownBy
      Evaluation.prAuc(Seq((0.5, 1L)).toDF("s", "y"), "s", "y").head()
  }

  test("prAuc groups tied scores into one operating point") {
    // one threshold at 0.5 carrying (1 pos, 1 neg), one at 0.3 (1 pos):
    // point1 (R=.5, P=.5) vs anchor P=1: term = .5*(0.5+1)/2 = .375
    // point2 (R=1, P=2/3), prev (.5,.5): term = .5*(2/3+.5)/2 = 7/24
    val df = Seq((0.5, 1L), (0.5, 0L), (0.3, 1L)).toDF("s", "y")
    Evaluation.prAuc(df, "s", "y").head()
      .getAs[Double]("pr_auc") shouldBe (0.375 + 7.0 / 24.0) +- 1e-12
  }

  test("liftTable: median split reproduces the hand gains table, best bin first") {
    // scores 1..10, responders at 9 and 10; k=2 cuts at 5.5
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 9) 1L else 0L)).toDF("s", "y")
    val rows = Evaluation.liftTable(df.repartition(3), "s", "y", k = 2).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 0L) // bin DESC
    val top = rows(0); val bot = rows(1)
    top.getAs[Long]("n") shouldBe 5L
    top.getAs[Long]("n_pos") shouldBe 2L
    top.getAs[Double]("rate") shouldBe 0.4 +- 1e-12
    top.getAs[Double]("lift") shouldBe 2.0 +- 1e-12
    top.getAs[Double]("cum_capture") shouldBe 1.0 +- 1e-12
    top.getAs[Double]("cum_lift") shouldBe 2.0 +- 1e-12
    bot.getAs[Double]("rate") shouldBe 0.0 +- 1e-12
    bot.getAs[Double]("cum_capture") shouldBe 1.0 +- 1e-12
    bot.getAs[Double]("cum_lift") shouldBe 1.0 +- 1e-12
    an[IllegalArgumentException] should be thrownBy
      Evaluation.liftTable(df, "s", "y", k = 1)
  }

  test("brierDecomposition: hand trace and the exact Murphy identity") {
    // forecasts: p=0.2 x5 (1 pos), p=0.8 x5 (4 pos) -> base = 0.5
    val rows = (Seq.fill(4)((0.2, 0L)) :+ ((0.2, 1L))) ++
      (Seq.fill(4)((0.8, 1L)) :+ ((0.8, 0L)))
    val df = rows.map { case (p, y) => (p, y) }.toDF("p", "y").repartition(3)
    val r = Evaluation.brierDecomposition(df, "p", "y").head()
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Long]("n_forecasts") shouldBe 2L
    r.getAs[Double]("base_rate") shouldBe 0.5 +- 1e-12
    // REL: both bins |p - ybar| = 0 -> 0; RES: both |ybar - base| = 0.3
    r.getAs[Double]("reliability") shouldBe 0.0 +- 1e-12
    r.getAs[Double]("resolution") shouldBe 0.09 +- 1e-12
    r.getAs[Double]("uncertainty") shouldBe 0.25 +- 1e-12
    // identity AND the direct mean((p-y)^2): 0 - 0.09 + 0.25 = 0.16
    r.getAs[Double]("brier") shouldBe 0.16 +- 1e-12
    val direct = rows.map { case (p, y) => (p - y) * (p - y) }.sum / 10.0
    r.getAs[Double]("brier") shouldBe direct +- 1e-12
  }

  test("brierDecomposition identity holds on an arbitrary forecast set") {
    val rows = (1 to 97).map(i => ((i % 13).toDouble / 13.0, (i % 3 == 0)))
    val df = rows.toDF("p", "yb")
      .withColumn("y", org.apache.spark.sql.functions.col("yb").cast("long"))
    val r = Evaluation.brierDecomposition(df, "p", "y").head()
    val direct = rows.map { case (p, b) =>
      val y = if (b) 1.0 else 0.0; (p - y) * (p - y) }.sum / rows.size
    r.getAs[Double]("brier") shouldBe direct +- 1e-9
    r.getAs[Double]("brier") shouldBe
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
        r.getAs[Double]("uncertainty")) +- 1e-12
  }

  test("aucDeLong: matches the brute-force placement computation, ties included") {
    // 40 scored rows with heavy ties (score = i % 7), alternating-ish labels
    val rows = (0 until 40).map(i => ((i % 7).toDouble, if ((i * 3) % 5 < 2) 1L else 0L))
    val df = rows.toDF("score", "y").repartition(5)
    val r = Evaluation.aucDeLong(df, "score", "y").head()
    // brute force: placements per positive / negative
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    def cmp(a: Double, b: Double) = if (a > b) 1.0 else if (a == b) 0.5 else 0.0
    val v10 = pos.map(p => neg.map(n => cmp(p, n)).sum / neg.size)
    val v01 = neg.map(n => pos.map(p => cmp(p, n)).sum / pos.size)
    val auc = v10.sum / pos.size
    def sVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val varAuc = sVar(v10) / pos.size + sVar(v01) / neg.size
    r.getAs[Long]("n_pos") shouldBe pos.size.toLong
    r.getAs[Long]("n_neg") shouldBe neg.size.toLong
    r.getAs[Double]("auc") shouldBe auc +- 1e-12
    r.getAs[Double]("var_auc") shouldBe varAuc +- 1e-12
    r.getAs[Double]("se_auc") shouldBe math.sqrt(varAuc) +- 1e-12
    r.getAs[Double]("ci_lo") shouldBe (auc - 1.96 * math.sqrt(varAuc)) +- 1e-12
    r.getAs[Double]("ci_hi") shouldBe (auc + 1.96 * math.sqrt(varAuc)) +- 1e-12
    // and the point AUC agrees with the v1 operator
    val v1 = Evaluation.rocAuc(df, "score", "y").head().getAs[Double]("auc")
    r.getAs[Double]("auc") shouldBe v1 +- 1e-12
  }

  test("aucDeLong: perfect separation has zero variance; one-class input refuses") {
    val sep = ((1 to 10).map(i => (i.toDouble, 0L)) ++
      (11 to 20).map(i => (i.toDouble, 1L))).toDF("score", "y")
    val r = Evaluation.aucDeLong(sep, "score", "y").head()
    r.getAs[Double]("auc") shouldBe 1.0 +- 1e-15
    r.getAs[Double]("var_auc") shouldBe 0.0 +- 1e-15
    an[Exception] should be thrownBy
      Evaluation.aucDeLong((1 to 5).map(i => (i.toDouble, 1L)).toDF("score", "y"),
        "score", "y").collect()
  }
}
