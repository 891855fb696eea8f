package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property tests for the wave-3 operators, following the
  * RoundNinePropertySpec discipline: fixed-seed ScalaCheck generators,
  * each property one Spark evaluation over a generated batch — and for
  * the distributed operators, a naive in-memory oracle computed in plain
  * Scala. */
class Wave3PropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("triangleCounts equals the naive enumeration on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(4, 14)            // node count
      density <- Gen.chooseNum(20, 70)     // percent of possible edges
      picks <- Gen.listOfN(n * n, Gen.chooseNum(0, 99))
    } yield {
      val pairs = for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)
      pairs.zip(picks).collect { case (e, p) if p < density => e }
    }
    for ((edges, i) <- sample(graphGen, 8, 3100L).zipWithIndex) {
      val naive = {
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val tri = for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield Seq(a, b, c)
        tri.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      }
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else Graph.triangleCounts(
            Graph.canonicalEdges(edges.toDF("src", "dst"), "src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"case $i (${edges.size} edges): ") { got shouldBe naive }
    }
  }

  test("bm25 matches a naive in-memory implementation on random corpora") {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "pad")
    val docGen = for {
      n <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val docs = sample(docGen, 40, 3200L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val terms = Seq("alpha", "delta")
    val naive: Map[Long, Double] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val nDocs = toks.size
      val avgdl = toks.map(_._2.size).sum.toDouble / nDocs
      val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
      toks.flatMap { case (id, tk) =>
        val dl = tk.size.toDouble
        val score = terms.map { t =>
          val tf = tk.count(_ == t).toDouble
          val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }.sum
        if (score > 0.0) Some(id -> score) else None
      }.toMap
    }
    val got = Search.bm25(docs.toDF("id", "text"), "id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.keySet shouldBe naive.keySet
    got.foreach { case (id, s) => s shouldBe naive(id) +- 1e-9 }
  }

  test("canonicalizeUrl is idempotent on random URL-ish strings") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "hTTp")
      host <- Gen.oneOf("Example.org", "sub.EX.net", "x-y.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/")
      q <- Gen.oneOf("", "?utm_source=z", "?id=3", "?id=3&utm_x=1")
      frag <- Gen.oneOf("", "#top", "#a/b?c")
    } yield s"$scheme://$host$port$path$q$frag"
    val urls = sample(urlGen, 150, 3300L)
    val rows = urls.toDF("u")
      .select(TextAnalysis.canonicalizeUrl($"u").as("c1"))
      .select($"c1", TextAnalysis.canonicalizeUrl($"c1").as("c2"))
      .collect()
    rows.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("mergeAggState equals the direct aggregate on random splits") {
    val rowGen = for {
      k <- Gen.chooseNum(0L, 6L)
      v <- Gen.chooseNum(-1000, 1000)
      side <- Gen.oneOf(0, 1)
    } yield (k, v.toDouble / 4, side)
    val rows = sample(rowGen, 300, 3400L)
    val all = rows.toDF("k", "v", "side")
    def aggOf(df: org.apache.spark.sql.DataFrame) = df.groupBy("k").agg(
      count(lit(1)).as("n"), sum($"v").as("s"), min($"v").as("mn"), max($"v").as("mx"))
    val merged = Merge.mergeAggState(
        aggOf(all.filter($"side" === 0)), aggOf(all.filter($"side" === 1)),
        Seq("k"), Map("n" -> "sum", "s" -> "sum", "mn" -> "min", "mx" -> "max"))
      .select($"k", $"n", $"s", $"mn", $"mx").orderBy("k").collect().toSeq.map(_.toSeq)
    val direct = aggOf(all).select($"k", $"n", $"s", $"mn", $"mx")
      .orderBy("k").collect().toSeq.map(_.toSeq)
    // double sums: same addends, possibly different association — compare
    // with tolerance on the sum column, exactly elsewhere
    merged.zip(direct).foreach { case (m, d) =>
      m(0) shouldBe d(0); m(1) shouldBe d(1)
      m(2).asInstanceOf[Double] shouldBe d(2).asInstanceOf[Double] +- 1e-9
      m(3) shouldBe d(3); m(4) shouldBe d(4)
    }
  }

  test("aHashPairs equals the brute-force hamming join on random images") {
    def bmp(seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val body = new Array[Byte](192)
      r.nextBytes(body)
      Multimodal.bmp24Header(8, 8) ++ body
    }
    // clusters of near-identical images: base + one-byte perturbations
    val imgs: Seq[(Long, Array[Byte])] = (0 until 10).flatMap { c =>
      val base = bmp(c)
      (0 until 3).map { v =>
        val b = base.clone()
        if (v > 0) b(54 + v) = (b(54 + v) + 1).toByte
        ((c * 3 + v).toLong, b)
      }
    }
    val hashes = imgs.map { case (id, b) =>
      id -> Multimodal.aHash64Quarters(b).get }
    val naive = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      h = (0 until 4).map(i => Integer.bitCount(ha(i) ^ hb(i))).sum
      if h <= 3
    } yield (ia, ib, h)).sortBy(p => (p._1, p._2))
    val got = Multimodal.aHashPairs(
        Multimodal.withImageAHash(imgs.toDF("id", "payload"), "payload"),
        "id", "ahash", maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    got shouldBe naive
  }
}
