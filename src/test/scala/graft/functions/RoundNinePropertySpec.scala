package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the round-9 primitives, following the
  * TableOnePropertySpec discipline: ScalaCheck generators driven from
  * fixed seeds (fully deterministic), each property evaluated as ONE
  * Spark projection over a generated batch rather than a job per case. */
class RoundNinePropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("zorderKey matches the reference interleave on random points (batched)") {
    def refMorton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)) }
    val ptGen = for {
      x <- Gen.chooseNum(0L, 65535L)
      y <- Gen.chooseNum(0L, 65535L)
    } yield (x, y)
    val pts = sample(ptGen, 300, 9100L)
    val got = pts.toDF("x", "y")
      .select($"x", $"y",
        graft.sources.Sinks.zorderKey(Seq($"x", $"y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => got((x, y)) shouldBe refMorton(x, y, 16) }
  }

  test("charEntropy: bounds, permutation invariance, doubling invariance (batched)") {
    val textGen = for {
      n <- Gen.chooseNum(1, 80)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ', '1', 'é', '中')))
    } yield cs.mkString
    val texts = sample(textGen, 120, 9200L)
    val shuffled = texts.map(t => new scala.util.Random(1).shuffle(t.toList).mkString)
    val rows = texts.zip(shuffled).toDF("t", "ts")
      .select(HashFunctions.charEntropy($"t").as("e"),
        HashFunctions.charEntropy($"ts").as("es"),
        HashFunctions.charEntropy(concat($"t", $"t")).as("ed"))
      .collect()
    rows.foreach { r =>
      val (e, es, ed) = (r.getStruct(0), r.getStruct(1), r.getStruct(2))
      val n = e.getInt(0); val h = e.getDouble(1)
      // bounds: 0 <= H <= log2(n) (can't beat uniform over n symbols)
      h should be >= 0.0
      h should be <= math.log(n.toDouble) / math.log(2.0) + 1e-9
      // a permutation of the characters has the identical distribution
      es.getDouble(1) shouldBe h +- 1e-9
      // doubling the text doubles every count: distribution unchanged
      ed.getInt(0) shouldBe 2 * n
      ed.getDouble(1) shouldBe h +- 1e-9
    }
  }

  test("positionalShingleHash: prefix stability under append (batched)") {
    // the first |A|-n+1 gram hashes of A++B equal the gram hashes of A:
    // appending text can only ADD windows, never rewrite earlier ones
    val tokGen = Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))
    val pairs = sample(tokGen.flatMap(a => tokGen.map(b => (a, b))), 80, 9300L)
    val n = 3
    val toks = (c: org.apache.spark.sql.Column) =>
      graft.ops.TextAnalysis.tokens(lower(c))
    val rows = pairs.toDF("a", "b")
      .select(
        HashFunctions.positionalShingleHash(toks($"a"), n).as("ga"),
        HashFunctions.positionalShingleHash(toks(concat_ws(" ", $"a", $"b")), n).as("gab"))
      .collect()
    rows.foreach { r =>
      val ga = r.getSeq[Long](0)
      val gab = r.getSeq[Long](1)
      gab.take(ga.size) shouldBe ga
    }
  }

  test("dupNgramFraction: [0,1] range; duplicating every doc forces 1.0") {
    val docGen = Gen.listOfN(8, Gen.chooseNum(0, 30).map(i => s"w$i")).map(_.mkString(" "))
    val docs = sample(docGen, 40, 9400L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val single = graft.ops.Dedup.dupNgramFraction(docs.toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect()
    single.foreach { r =>
      val f = r.getAs[Double]("dup_fraction")
      f should (be >= 0.0 and be <= 1.0)
    }
    // corpus + an exact copy of every doc (fresh ids): every gram now
    // occurs >= 2 times, so every doc's fraction is exactly 1.0
    val doubled = docs ++ docs.map { case (i, t) => (i + 1000L, t) }
    graft.ops.Dedup.dupNgramFraction(doubled.toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect().foreach(_.getAs[Double]("dup_fraction") shouldBe 1.0)
  }
}
