package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ScaleDataSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a representative ~54-token document like the synthetic corpus ships
  private val text = (1 to 54).map(i => s"tok${i % 37}w$i").mkString(" ")

  private def mutate(docId: Long, rep: Long): String =
    Seq((docId, rep, text)).toDF("doc_id", "rep", "text")
      .select(ScaleData.mutatedText(col("text"), col("doc_id"), col("rep")).as("m"))
      .head().getString(0)

  private def shingles3(s: String): Set[Seq[String]] =
    s.split(" ").toSeq.sliding(3).toSet

  private def jaccard3(a: String, b: String): Double = {
    val (sa, sb) = (shingles3(a), shingles3(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("exact-twin stratum (rep % 5 == 0) passes text through unchanged") {
    mutate(7L, 0L) shouldBe text
    mutate(7L, 5L) shouldBe text
    mutate(123L, 10L) shouldBe text
  }

  test("mutated replicas differ from the original and land near the 0.7-0.9 shingle-Jaccard band") {
    val sims = for (doc <- 1L to 30L; rep <- Seq(1L, 2L, 3L, 4L, 6L, 7L)) yield {
      val m = mutate(doc, rep)
      m should not be text
      jaccard3(text, m)
    }
    // the 2-6% token mutation rate puts (1-3r)/(1+3r) in ~[0.70, 0.94];
    // hash-Bernoulli variance gives a realistic tail on both sides
    sims.min should be > 0.35
    sims.max should be < 1.0
    val mean = sims.sum / sims.size
    mean should (be > 0.70 and be < 0.95)
    // the bulk of planted pairs sits in the production near-dup band
    sims.count(s => s >= 0.6 && s <= 0.98).toDouble / sims.size should be > 0.7
    // non-degenerate: the similarities spread, not a point mass
    sims.distinct.size should be > 10
  }

  test("mutation is deterministic in (doc_id, rep) and independent across reps") {
    mutate(42L, 3L) shouldBe mutate(42L, 3L)
    mutate(42L, 3L) should not be mutate(42L, 4L)
    mutate(42L, 3L) should not be mutate(43L, 3L)
  }

  // a unit-ish 16-dim embedding like the synthetic corpus ships
  private val vec = (1 to 16).map(i => (math.sin(i.toDouble) / 4.0).toFloat)

  private def jitter(vecId: Long, rep: Long): Seq[Float] =
    Seq((vecId, rep, vec)).toDF("vec_id", "rep", "embedding")
      .select(ScaleData.jitteredEmbedding(col("embedding"), col("vec_id"), col("rep")).as("j"))
      .head().getSeq[Float](0)

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("embedding exact-twin stratum (rep % 5 == 0) passes vectors through unchanged") {
    jitter(7L, 0L) shouldBe vec
    jitter(7L, 5L) shouldBe vec
    jitter(123L, 10L) shouldBe vec
  }

  test("jittered replicas spread over the near-dup cosine band, deterministically") {
    val sims = for (id <- 1L to 30L; rep <- Seq(1L, 2L, 3L, 4L, 6L, 7L)) yield {
      val j = jitter(id, rep)
      j should not be vec
      cosine(vec, j)
    }
    // amplitudes {0.15..1.2} target cosines ~{0.996..0.81}; per-draw
    // variance widens the band but must keep it both high-similarity
    // and genuinely spread (no 100-deep exact twin buckets, no noise soup)
    sims.min should be > 0.5
    sims.max should be > 0.98
    sims.count(_ < 0.97).toDouble / sims.size should be > 0.3
    jitter(42L, 3L) shouldBe jitter(42L, 3L)
    jitter(42L, 3L) should not be jitter(42L, 4L)
  }
}
