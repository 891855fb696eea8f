package graft.ops

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("banded proximity self-join equals the naive quadratic result") {
    val rows = Seq(1L -> 0L, 2L -> 5L, 3L -> 11L, 4L -> 12L, 5L -> 100L,
      6L -> 103L, 7L -> 110L, 8L -> 9L)
    val df = rows.map { case (id, s) => (id, ts(s)) }.toDF("id", "t")
    val got = RangeJoin.selfPairsWithin(df, "id", "t", toleranceSec = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib && math.abs(ta - tb) <= 10
    } yield (ia, ib)).toSet
    got shouldBe naive
    naive should contain (1L -> 2L) // sanity: fixture has in- and out-of-range pairs
    naive should not contain (1L -> 3L)
  }

  test("carry columns survive with _a/_b suffixes") {
    val df = Seq((1L, ts(0), "u1"), (2L, ts(3), "u2")).toDF("id", "t", "user")
    val r = RangeJoin.selfPairsWithin(df, "id", "t", 10, carryCols = Seq("user")).head()
    r.getAs[String]("user_a") shouldBe "u1"
    r.getAs[String]("user_b") shouldBe "u2"
  }
}
