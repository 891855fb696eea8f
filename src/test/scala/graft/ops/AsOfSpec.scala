package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AsOfSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left time") {
    val quotes = Seq( // key, time, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("k", "t", "price")
    val trades = Seq( // key, time, qty
      ("A", 5L, 100L),  // before any quote -> null
      ("A", 20L, 200L), // equal time -> that quote
      ("A", 25L, 300L), // between -> t=20 quote
      ("A", 99L, 400L), // after all -> t=30 quote
      ("B", 16L, 500L), // -> B's only quote
      ("C", 50L, 600L)) // key with no quotes -> null
      .toDF("k", "t", "qty")

    val out = AsOf.joinAsOf(trades, quotes, "k", "t", Seq("price"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t"), r.getAs[Long]("qty"),
        Option(r.getAs[java.lang.Double]("price")).map(_.doubleValue)))

    out shouldBe Array(
      ("A", 5L, 100L, None),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 16L, 500L, Some(9.0)),
      ("C", 50L, 600L, None))
  }

  test("multiple payload columns travel together") {
    val right = Seq(("A", 10L, 7L, "x")).toDF("k", "t", "rid", "tag")
    val left = Seq(("A", 11L)).toDF("k", "t")
    val r = AsOf.joinAsOf(left, right, "k", "t", Seq("rid", "tag")).head()
    r.getAs[Long]("rid") shouldBe 7L
    r.getAs[String]("tag") shouldBe "x"
  }
}
