package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BpeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent single-machine reference trainer — the classic
    * collect-the-vocab Sennrich loop, typed separately from the
    * distributed path on purpose (golden-constant discipline: two
    * implementations agreeing is the check). */
  private def refTrain(texts: Seq[String], nMerges: Int, minPair: Long = 2L): Seq[(String, String)] = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.split(s"[${TextAnalysis.WhitespaceClass}]+")
      .filter(_.nonEmpty).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L))
    var vocab: Map[Vector[String], Long] =
      wc.toMap.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (syms, m) => syms -> m.values.sum }
    val out = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1)); pc(p) = pc.getOrElse(p, 0L) + n
        }
      }
      if (pc.isEmpty) done = true
      else {
        val (best, cnt) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (cnt < minPair) done = true
        else {
          out += best
          vocab = vocab.groupBy { case (syms, _) =>
            Bpe.applyMerge(syms, best._1, best._2).toVector
          }.map { case (syms, m) => syms -> m.values.sum }
          r += 1
        }
      }
    }
    out.result()
  }

  test("applyMerge is greedy left-to-right: 'aaa' under (a,a) -> [aa, a]") {
    Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a")
    Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") shouldBe Seq("aa", "aa")
    Bpe.applyMerge(Seq("x", "a", "b", "y", "a", "b"), "a", "b") shouldBe Seq("x", "ab", "y", "ab")
    Bpe.applyMerge(Seq("q"), "a", "b") shouldBe Seq("q")
  }

  test("distributed train equals the reference trainer on the textbook corpus") {
    // Sennrich's running example shape: shared prefixes force interesting merges
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.map(t => (t, 1)).toDF("text", "i")
    val got = Bpe.train(df, "text", nMerges = 8).map(m => (m.left, m.right))
    got shouldBe refTrain(texts, 8)
    // the classic first merges: 'es' then 'est' dominate (9 occurrences)
    got.head shouldBe ("e", "s")
    got(1) shouldBe ("es", "t")
  }

  test("distributed train equals the reference on a messier corpus, any partitioning") {
    val texts = (1 to 200).map { i =>
      val ws = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      (0 until 1 + i % 4).map(j => ws((i * 7 + j * 3) % ws.size)).mkString(" ")
    }
    val want = refTrain(texts, 12)
    val df1 = texts.map(t => Tuple1(t)).toDF("text").repartition(1)
    val df7 = texts.map(t => Tuple1(t)).toDF("text").repartition(7)
    Bpe.train(df1, "text", 12).map(m => (m.left, m.right)) shouldBe want
    Bpe.train(df7, "text", 12).map(m => (m.left, m.right)) shouldBe want
  }

  test("train stops early when the best pair drops below minPairCount") {
    val df = Seq.fill(3)(Tuple1("ab")).toDF("text")
    val merges = Bpe.train(df, "text", nMerges = 10, minPairCount = 2)
    merges.map(m => (m.left, m.right)) shouldBe Seq(("a", "b")) // one pair, then nothing left
  }

  test("encodeWord applies merges in RANK order, not positional order") {
    // ranks: (b,c) before (a,b) — 'abc' must become [a, bc], not [ab, c]
    val ranks = Map(("b", "c") -> 1, ("a", "b") -> 2)
    Bpe.encodeWord("abc", ranks) shouldBe Seq("a", "bc")
    // chained: (a,bc) completes the word when present
    Bpe.encodeWord("abc", ranks + (("a", "bc") -> 3)) shouldBe Seq("abc")
    Bpe.encodeWord("zz", Map.empty) shouldBe Seq("z", "z")
  }

  test("withBpeTokens: tokens concatenate back to the words; counts consistent") {
    val texts = Seq.fill(4)("seen seen unseen") ++ Seq.fill(3)("seen scene")
    val merges = Bpe.train(texts.map(Tuple1(_)).toDF("text"), "text", 6)
    val out = Bpe.withBpeTokens(
      Seq((1L, "seen the unseen scene"), (2L, "")).toDF("id", "text"), "text", merges)
      .select(col("id"), col("bpe_tokens"), col("n_bpe_tokens"))
      .orderBy("id").collect()
    val toks = out(0).getSeq[String](1)
    toks.mkString shouldBe "seentheunseenscene" // lossless within words
    out(0).getInt(2) shouldBe toks.length
    out(1).getSeq[String](1) shouldBe Seq.empty
    out(1).getInt(2) shouldBe 0
    // trained merges compress: 'seen' (freq 7) must be fewer than 4 symbols
    val seen = Bpe.withBpeTokens(Seq(Tuple1("seen")).toDF("text"), "text", merges)
      .select(col("n_bpe_tokens")).head().getInt(0)
    seen should be < 4
  }

  test("x17 golden-constant justification: distributed train matches the reference on sf0.001 docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = Bpe.train(docs, "text", nMerges = 8).map(m => (m.left, m.right))
    got shouldBe refTrain(texts, 8)
  }
}
