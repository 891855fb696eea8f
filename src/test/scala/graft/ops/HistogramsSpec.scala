package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

class HistogramsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned: bin assignment, edge clamping, null skip") {
    val rows = Seq(("k", Option(0.0)), ("k", Option(9.99)), ("k", Option(10.0)),
      ("k", Option(25.0)), ("k", Option(-5.0)), ("k", Option(99.0)),
      ("k", Option(1000.0)), ("k", None))
    val out = Histograms.binned(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 100.0, 10)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // 0.0, 9.99 -> bin 0; -5 clamps to 0; 10 -> bin 1; 25 -> bin 2;
    // 99 -> bin 9; 1000 clamps to 9; null skipped
    out shouldBe Map(0 -> 3L, 1 -> 1L, 2 -> 1L, 9 -> 2L)
  }

  test("mergeState(hist(A), hist(B)) equals hist(A union B) exactly") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100.0, i))
    val all = rows.toDF("g", "v", "i")
    def h(df: org.apache.spark.sql.DataFrame) =
      Histograms.binned(df, Seq("g"), "v", 0.0, 100.0, 16)
    val merged = Histograms.mergeState(
        h(all.filter($"i" % 2 === 0)), h(all.filter($"i" % 2 =!= 0)), Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val direct = h(all)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    merged shouldBe direct
  }

  test("quantileFromBins: exact on data aligned to bin interiors, within width otherwise") {
    // uniform 0..999 in [0,1000) over 10 bins: q50 target 500 falls in
    // bin 5 (cum 600, cnt 100, cumBefore 500) -> 500 + 0/100... wait:
    // target = 0.5*1000 = 500, first bin with cum >= 500 is bin 4
    // (cum 500), est = 0 + (4 + (500-400)/100)*100 = 500
    val rows = (0 until 1000).map(i => ("u", i + 0.5))
    val out = Histograms.quantileFromBins(
        Histograms.binned(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 1000.0, 10),
        Seq("g"), 0.0, 1000.0, 10, Seq("q50" -> 0.5, "q90" -> 0.9))
      .collect().head
    out.getDouble(1) shouldBe 500.0 +- 1e-9
    out.getDouble(2) shouldBe 900.0 +- 1e-9
    // and against the true quantiles of arbitrary data: within bin width
    val rnd = new scala.util.Random(9)
    val data = (1 to 5000).map(_ => ("r", rnd.nextDouble() * 200.0 - 50.0))
    val est = Histograms.quantileFromBins(
        Histograms.binned(data.toDF("g", "v"), Seq("g"), "v", -50.0, 150.0, 40),
        Seq("g"), -50.0, 150.0, 40, Seq("q50" -> 0.5))
      .collect().head.getDouble(1)
    val sorted = data.map(_._2).sorted
    val truth = sorted((0.5 * (sorted.length - 1)).toInt)
    math.abs(est - truth) should be <= (200.0 / 40 + 1e-9)
  }

  test("quantileFromBins: p=1 lands on the last occupied bin's top edge region") {
    val rows = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0))
    val est = Histograms.quantileFromBins(
        Histograms.binned(rows.toDF("g", "v"), Seq("g"), "v", 0.0, 100.0, 10),
        Seq("g"), 0.0, 100.0, 10, Seq("q100" -> 1.0))
      .collect().head.getDouble(1)
    // bin 3 (30..40), cum 3 = target, cumBefore 2 -> 0 + (3 + 1/1)*10 = 40
    est shouldBe 40.0 +- 1e-9
  }

  test("binned rejects bad parameters") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      Histograms.binned(df, Seq("g"), "v", 0.0, 100.0, 0)
    an[IllegalArgumentException] should be thrownBy
      Histograms.binned(df, Seq("g"), "v", 5.0, 5.0, 10)
    an[IllegalArgumentException] should be thrownBy
      Histograms.quantileFromBins(df, Seq("g"), 0.0, 1.0, 4, Seq("q" -> 0.0))
  }
}
