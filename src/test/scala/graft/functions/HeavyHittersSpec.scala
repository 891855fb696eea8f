package graft.functions

import graft.TestSpark
import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.collection.mutable

class HeavyHittersSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Drive the Aggregator directly (no Spark) over a stream. */
  private def sketchOf(items: Seq[String], k: Int): Map[String, Long] = {
    val mg = new MisraGries(k)
    mg.finish(items.foldLeft(mg.zero)(mg.reduce))
  }

  test("MG guarantee: every item above the N/(k+1) floor is present, undercount bounded") {
    // hot = 30%, warm = 12%, floor at k=9 is N/10 = 10%; noise is unique
    val n = 10000
    val stream = (0 until n).map { i =>
      if (i % 10 < 3) "hot" else if (i % 25 < 3) "warm" else s"noise_$i"
    }
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketchOf(stream, k = 9)
    sk.keySet should contain ("hot")
    sk.keySet should contain ("warm")
    sk.size should be <= 9
    // estimates are lower bounds, off by at most N/(k+1)
    sk.foreach { case (t, est) =>
      est should be <= trueCounts(t)
      (trueCounts(t) - est) should be <= (n / 10).toLong
    }
  }

  test("merge preserves the guarantee across arbitrary splits") {
    val stream = (0 until 8000).map { i =>
      if (i % 8 < 2) "hot" else s"n$i" // hot = 25%, floor at k=7 is 12.5%
    }
    val mg = new MisraGries(7)
    // split into uneven chunks, sketch each, merge pairwise
    val parts = stream.grouped(1234).toSeq
      .map(chunk => chunk.foldLeft(mg.zero)(mg.reduce))
    val merged = mg.finish(parts.reduce { (a, b) => mg.merge(a, mutable.HashMap(b.toSeq: _*)) })
    merged.keySet should contain ("hot")
    merged.size should be <= 7
    merged("hot") should be <= 2000L
    (2000L - merged("hot")) should be <= 1000L
  }

  test("sketch + exact re-count composes to the exact above-floor set (x9 shape)") {
    val k = 5
    val rows = (0 until 3000).map { i =>
      val t = if (i % 3 == 0) "alpha" else if (i % 3 == 1) "beta" else s"rare_${i % 600}"
      Tuple1(t)
    }
    val tk = rows.toDF("token").repartition(7)
    val mg = F.udaf(new MisraGries(k), Encoders.STRING)
    val sk = tk.agg(mg(F.col("token")).as("sketch"), F.count(F.lit(1)).as("total"))
    val cand = sk.select(F.explode(F.map_keys(F.col("sketch"))).as("token"), F.col("total"))
    val out = tk.join(F.broadcast(cand), Seq("token"))
      .groupBy("token", "total").agg(F.count(F.lit(1)).as("n"))
      .filter(F.col("n") * (k + 1) > F.col("total"))
      .select("token", "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // exact derivation: alpha and beta each 1000/3000 = 33% > 1/6 floor;
    // every rare_* is 5/3000 << floor
    out shouldBe Map("alpha" -> 1000L, "beta" -> 1000L)
  }

  test("sketch candidates are stable across repartitionings (superset property)") {
    val rows = (0 until 4000).map { i => Tuple1(if (i % 4 == 0) "heavy" else s"n$i") }
    Seq(1, 3, 16).foreach { parts =>
      val tk = rows.toDF("token").repartition(parts)
      val mg = F.udaf(new MisraGries(10), Encoders.STRING)
      val keys = tk.agg(mg(F.col("token")).as("sk"))
        .select(F.explode(F.map_keys(F.col("sk"))).as("t"))
        .as[String].collect().toSet
      keys should contain ("heavy")
    }
  }

  test("mergeSummaries preserves the heavy-hitter bound across batches") {
    // exact merge below capacity: plain counter union
    MisraGries.mergeSummaries(Map("a" -> 3L), Map("a" -> 2L, "b" -> 1L), k = 4) shouldBe
      Map("a" -> 5L, "b" -> 1L)
    // over capacity: subtract the (k+1)-th largest, drop <= 0
    val m = MisraGries.mergeSummaries(
      Map("a" -> 10L, "b" -> 4L), Map("c" -> 6L, "d" -> 1L), k = 3)
    m shouldBe Map("a" -> 9L, "b" -> 3L, "c" -> 5L) // cut = 1 (4th largest)
    // end-to-end: summarize two halves of a stream separately, merge,
    // and the true heavy item must survive with a bounded undercount
    val stream = (0 until 3000).map(i => if (i % 3 == 0) "heavy" else s"n$i")
    val (h1, h2) = stream.splitAt(1500)
    def summarize(xs: Seq[String]): Map[String, Long] = {
      val agg = new MisraGries(10)
      xs.foldLeft(agg.zero)(agg.reduce).toMap
    }
    val merged = MisraGries.mergeSummaries(summarize(h1), summarize(h2), k = 10)
    merged.keySet should contain ("heavy")
    merged("heavy") should be >= (1000L - 3000L / 11L)
    merged.size should be <= 10
    an[IllegalArgumentException] should be thrownBy
      MisraGries.mergeSummaries(Map.empty, Map.empty, 0)
  }
}
