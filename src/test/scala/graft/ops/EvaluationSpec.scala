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
}
