package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BootstrapSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 2147483647L
  private def lehmer(id: Long, seed: Long): Long = {
    val s1 = math.floorMod(math.floorMod(id + seed, M) * 48271L, M)
    math.floorMod(s1 * 48271L, M)
  }
  private def weight(pr: Long): Int = {
    val i = Sampling.poissonThresholds.indexWhere(pr < _)
    if (i < 0) 8 else i
  }

  test("poisson weights are Poisson(1)-shaped and deterministic") {
    val ids = (0L until 100000L).toDF("id")
    val w = ids.select(Sampling.poissonWeight(
        Sampling.lehmerPriority(org.apache.spark.sql.functions.col("id"), 7L))
        .as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = w.values.sum.toDouble
    w(0) / n shouldBe math.exp(-1.0) +- 0.01
    w(1) / n shouldBe math.exp(-1.0) +- 0.01
    val mean = w.map { case (k, c) => k * c }.sum / n
    mean shouldBe 1.0 +- 0.02
  }

  test("replicate means replay exactly from the integer thresholds") {
    val rows = (1L to 50L).map(i => (i, (i * 3 % 11).toDouble))
    val df = rows.toDF("id", "x")
    val out = Sampling.poissonBootstrapMeans(df.repartition(5), "id", "x",
        b = 3, seed = 10L)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replicate 0 is the plain mean
    out(0)._1 shouldBe 50L
    out(0)._2 shouldBe rows.map(_._2).sum / 50.0 +- 1e-12
    // replicate b: fold the SAME Lehmer + threshold arithmetic in Scala
    for (b <- 1 to 3) {
      val ws = rows.map { case (id, x) => (weight(lehmer(id, 10L + b)), x) }
      val nEff = ws.map(_._1.toLong).sum
      out(b)._1 shouldBe nEff
      out(b)._2 shouldBe (ws.map { case (w, x) => w * x }.sum / nEff) +- 1e-9
    }
  }

  test("bootstrap CI brackets the point mean on well-behaved data") {
    val df = (1L to 2000L).map(i => (i, (i % 100).toDouble)).toDF("id", "x")
    val r = Sampling.poissonBootstrapCi(df, "id", "x", b = 40, seed = 3L,
      alpha = 0.1).head()
    r.getAs[Int]("b") shouldBe 40
    r.getAs[Long]("n") shouldBe 2000L
    val (pt, lo, hi) = (r.getAs[Double]("point_mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    lo should be < hi
    pt should (be >= lo and be <= hi)
    // the interval is tight at n=2000 (sd ~ 29/sqrt(2000) ~ 0.65)
    (hi - lo) should be < 4.0
    an[IllegalArgumentException] should be thrownBy
      Sampling.poissonBootstrapCi(df, "id", "x", 40, 1L, alpha = 0.0)
    an[IllegalArgumentException] should be thrownBy
      Sampling.poissonBootstrapMeans(df, "id", "x", 1)
  }

  test("weights and means are partitioning-independent") {
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "x")
    val a = Sampling.poissonBootstrapMeans(df.repartition(1), "id", "x", 5, 2L)
      .orderBy("replicate").collect().map(r => (r.getInt(0), r.getLong(1)))
    val b = Sampling.poissonBootstrapMeans(df.repartition(17), "id", "x", 5, 2L)
      .orderBy("replicate").collect().map(r => (r.getInt(0), r.getLong(1)))
    b shouldBe a
  }
}
