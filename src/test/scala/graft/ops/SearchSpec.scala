package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SearchSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] =
    Search.bm25(docs.toDF("id", "text"), "id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("docs without any query term are excluded; matches score positive") {
    val s = scores(Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon"), Seq("alpha"))
    s.keySet shouldBe Set(1L)
    s(1L) should be > 0.0
  }

  test("higher tf at equal length scores higher") {
    val s = scores(Seq(1L -> "x x y", 2L -> "x y y", 3L -> "y y y z z"), Seq("x"))
    s(1L) should be > s(2L)
    s.contains(3L) shouldBe false
  }

  test("rarer term contributes more (idf) at equal tf and length") {
    // 'rare' in 1 of 4 docs, 'common' in 3 of 4; doc 1 and 2 have equal
    // length and tf=1 for their respective term
    val docs = Seq(
      1L -> "rare pad pad", 2L -> "common pad pad",
      3L -> "common filler here", 4L -> "common another doc")
    val s = scores(docs, Seq("rare", "common"))
    s(1L) should be > s(2L)
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val s = scores(Seq(1L -> "q a", 2L -> "q a b c d e f g"), Seq("q"))
    s(1L) should be > s(2L)
  }

  test("golden value: single doc, single term") {
    // N=1, df=1, tf=2, dl=3, avgdl=3 =>
    // idf = ln((1-1+0.5)/(1+0.5)+1) = ln(4/3)
    // score = idf * 2 * 2.2 / (2 + 1.2*(0.25 + 0.75*1)) = idf*4.4/3.2
    val s = scores(Seq(1L -> "t t u"), Seq("t"))
    val expected = math.log(4.0 / 3.0) * 2.0 * 2.2 / (2.0 + 1.2 * (0.25 + 0.75 * 1.0))
    s(1L) shouldBe expected +- 1e-12
  }

  test("case-insensitive match and duplicate query terms collapse") {
    val a = scores(Seq(1L -> "Foo bar"), Seq("foo"))
    val b = scores(Seq(1L -> "Foo bar"), Seq("FOO", "foo"))
    a(1L) shouldBe b(1L) +- 1e-12
  }

  test("bm25TopK returns k best, score-desc, id tiebreak, and is partition-stable") {
    val docs = (1L to 40L).map(i => i -> (Seq.fill((i % 4).toInt)("hit") ++
      Seq.fill(5)("pad")).mkString(" "))
    val top = Search.bm25TopK(docs.toDF("id", "text").repartition(7),
      "id", "text", Seq("hit"), k = 10).collect()
    top.length shouldBe 10
    val s = top.map(_.getDouble(2))
    s.zip(s.tail).foreach { case (a, b) => a should be >= b }
    // ties (same tf/dl) must come out in id order
    val tied = top.filter(_.getDouble(2) == s.head).map(_.getLong(0))
    tied shouldBe tied.sorted
  }

  test("rejects empty and oversized term sets") {
    an[IllegalArgumentException] should be thrownBy
      Search.bm25(Seq(1L -> "x").toDF("id", "text"), "id", "text", Nil)
    an[IllegalArgumentException] should be thrownBy
      Search.bm25(Seq(1L -> "x").toDF("id", "text"), "id", "text",
        (1 to 65).map(i => s"t$i"))
  }
}
