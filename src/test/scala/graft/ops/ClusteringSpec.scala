package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ClusteringSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated direction clusters in 4-d: points near +x, +y, +z
  // (unit-ish with small deterministic jitter on one other axis)
  private def separated = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val jitter = 0.05 * ((i % 5) + 1)
      val base = Array(0.0, 0.0, 0.0, 0.0)
      base(c) = 1.0
      base(3) = jitter
      (c * 100L + i, base.toSeq, c)
    }
    rows.toDF("id", "vec", "true_cluster")
  }

  test("fit recovers well-separated direction clusters exactly") {
    val df = separated
    val cents = Clustering.fit(df, "id", "vec", k = 3, iters = 5)
    cents should have size 3
    val assigned = Clustering.quantize(df, "id", "vec", cents)
      .join(df.select(col("id"), col("true_cluster")), Seq("id"))
      .select(col("centroid_id"), col("true_cluster"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // every true cluster maps to exactly one centroid and vice versa
    val mapping = assigned.groupBy(_._2).map { case (t, rows) =>
      t -> rows.map(_._1).distinct
    }
    mapping.values.foreach(_ should have size 1)
    mapping.values.flatten.toSeq.distinct should have size 3
  }

  test("fit is deterministic for the same input") {
    val df = separated
    val a = Clustering.fit(df, "id", "vec", k = 3, iters = 3)
    val b = Clustering.fit(df, "id", "vec", k = 3, iters = 3)
    // identical init and identical single-partition-order arithmetic on
    // this tiny fixture -> bit-identical codebooks
    a shouldBe b
  }

  test("fit stops early at convergence: a 50-round budget equals a 5-round fit") {
    // the separated fixture converges in a handful of rounds; with the
    // movement-based exit, the extra 45 budgeted rounds never run (and
    // cannot change the answer)
    val df = separated
    val short = Clustering.fit(df, "id", "vec", k = 3, iters = 5)
    val long = Clustering.fit(df, "id", "vec", k = 3, iters = 50)
    long shouldBe short
  }

  test("quantize: assignment, tie-break to lowest index, exact cosine") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val df = Seq(
      (1L, Seq(2.0, 0.0)),   // -> centroid 0 (cos 1), NOT the identical 2
      (2L, Seq(0.0, 5.0)),   // -> centroid 1
      (3L, Seq(3.0, 4.0))    // cos 0.6 vs 0.8 -> centroid 1
    ).toDF("id", "vec")
    val got = Clustering.quantize(df, "id", "vec", cents)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    got(0) shouldBe ((1L, 0, 1.0))
    got(1) shouldBe ((2L, 1, 1.0))
    got(2)._2 shouldBe 1
    got(2)._3 shouldBe 0.8 +- 1e-12
  }

  test("clusterProfile emits every centroid id, empty clusters as n=0") {
    // both points sit on +x: centroid 1 (on +y) never wins
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Seq(1.0, 0.0), "en"), (2L, Seq(2.0, 0.0), "en"))
      .toDF("id", "vec", "lang")
    val got = Clustering.clusterProfile(df, "id", "vec", cents, Some("lang"))
      .orderBy("centroid_id").collect()
    got should have length 2
    got(0).getLong(1) shouldBe 2L        // n
    got(0).getString(3) shouldBe "en"    // top_label
    got(0).getDouble(4) shouldBe 1.0     // purity
    got(1).getLong(1) shouldBe 0L
    got(1).isNullAt(3) shouldBe true
  }

  test("semanticDedup: min-id dominance within clusters, boundary pairs survive, cap exempts") {
    // codebook: +x and +y cells
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Seq(1.0, 0.00)),   // cluster 0, the dominating representative
      (2L, Seq(1.0, 0.01)),   // cluster 0, ~cos 1 vs id 1 -> removed
      (3L, Seq(1.0, 0.02)),   // cluster 0, removed (dominated by 1 AND 2)
      (4L, Seq(0.0, 1.0)),    // cluster 1, survives alone
      (5L, Seq(0.8, 0.75))    // cluster 0 but near the boundary; cos vs
                              // (1,0)-ish rows ~0.73 < tau -> survives
    ).toDF("id", "vec")
    val kept = Clustering.semanticDedup(df, "id", "vec", cents, tau = 0.99)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    kept shouldBe Array((1L, 0), (4L, 1), (5L, 0))

    // a near-identical pair SPLIT across clusters is the documented miss:
    // (6 -> +x cell, 7 -> +y cell) at 45 degrees +- epsilon — cosine
    // ~1.0 but never compared, both survive
    val boundary = Seq(
      (6L, Seq(1.0, 0.999)), (7L, Seq(0.999, 1.0))).toDF("id", "vec")
    val keptB = Clustering.semanticDedup(boundary, "id", "vec", cents, tau = 0.9)
      .collect().map(_.getLong(0)).sorted
    keptB shouldBe Array(6L, 7L)

    // cap: the 4-row +x cluster is above maxClusterSize = 3 -> exempt
    // from dedup entirely, every row survives
    val keptCap = Clustering.semanticDedup(df, "id", "vec", cents,
      tau = 0.99, maxClusterSize = 3).collect().map(_.getLong(0)).sorted
    keptCap shouldBe Array(1L, 2L, 3L, 4L, 5L)

    // the cap boundary is INCLUSIVE: at maxClusterSize = 4 the same
    // 4-row cluster is in scope and dedups fully — so the comparison
    // count per cluster is bounded by cap², never cap² + anything (the
    // r14 verdict #6 bound pin, the cluster-side twin of the
    // minHashLshPairs bucket-bound spec)
    val keptAt = Clustering.semanticDedup(df, "id", "vec", cents,
      tau = 0.99, maxClusterSize = 4).collect().map(_.getLong(0)).sorted
    keptAt shouldBe Array(1L, 4L, 5L)
  }

  test("semanticDedup pair self-join reuses one exchange under shuffle joins") {
    // with broadcast off, the a/b sides of the within-cluster pair join
    // are the same canonical plan — the exchange must be planned once and
    // reused, not scanned+shuffled twice
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
      val df = (1L to 100L).map(i => (i, Seq(1.0, 0.001 * i))).toDF("id", "vec")
      val out = Clustering.semanticDedup(df, "id", "vec", cents, tau = 0.999999)
      out.collect()
      val finalPlan = out.queryExecution.executedPlan.toString
      finalPlan should include("ReusedExchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fit on testdata embeddings: full profile structure and cohesion") {
    // the synthetic embeddings are near-uniform unit vectors (measured:
    // same-label mean cosine 0.005 vs cross-label 0.0006), so labels are
    // NOT geometrically recoverable — the test pins the operator's
    // structural contract, not an impossible purity
    val e = graft.Util.table(spark, "/root/testdata/sf0.01", "embeddings")
    val cents = Clustering.fit(e, "vec_id", "embedding", k = 10, iters = 5)
    val prof = Clustering.clusterProfile(e, "vec_id", "embedding", cents,
      labelCol = Some("label")).collect()
    prof should have length 10
    val n = prof.map(_.getLong(1)).sum
    n shouldBe 500L
    // cohesion: assigned-centroid cosine must clearly beat the ~0 random
    // pairwise level — best-of-10 choice plus Lloyd refinement
    val weightedCos = prof.filter(_.getLong(1) > 0)
      .map(r => r.getDouble(2) * r.getLong(1)).sum / n
    weightedCos should be >= 0.05
  }

  test("VectorSum is partition-shape independent (exact on integer-valued doubles)") {
    // integer-valued doubles sum exactly in ANY order, so 1 partition and
    // 7 partitions must agree bit-for-bit — pinning that the aggregator's
    // reduce/merge are a true commutative monoid (null rows contribute 0)
    import org.apache.spark.sql.functions.udaf
    val vsum = udaf(new graft.functions.VectorSum(3), VectorSumEncoders.seqDouble)
    val rows = (1 to 97).map(i => Tuple1(Seq(i.toDouble, (i * 2).toDouble, (i % 7).toDouble))) :+
      Tuple1(null.asInstanceOf[Seq[Double]])
    def total(parts: Int) = rows.toDF("v").repartition(parts)
      .agg(vsum(col("v"))).head().getSeq[Double](0)
    val expect = Seq((1 to 97).map(_.toDouble).sum,
      (1 to 97).map(_ * 2.0).sum, (1 to 97).map(i => (i % 7).toDouble).sum)
    total(1) shouldBe expect
    total(7) shouldBe expect
  }

  test("Lloyd rounds refine an explicit init to the spherical cluster means") {
    // init slightly off the true axes; after refinement each centroid must
    // land on the normalized mean of its blob (computable by hand from the
    // fixture: all blob points are (1, 0, 0, jitter)-shaped up to axis
    // permutation, jitter cycling 0.05..0.25)
    val df = separated
    val init = Seq(
      Seq(0.9, 0.1, 0.0, 0.1), Seq(0.1, 0.9, 0.0, 0.1), Seq(0.0, 0.1, 0.9, 0.1))
    val cents = Clustering.fit(df, "id", "vec", k = 3, iters = 4, init = Some(init))
    // expected spherical mean of one blob: mean of normalized
    // (1, jitter) over jitter in {0.05..0.25} x 4 each, renormalized
    val jitters = (0 until 20).map(i => 0.05 * ((i % 5) + 1))
    val normed = jitters.map { j =>
      val n = math.sqrt(1.0 + j * j); (1.0 / n, j / n)
    }
    val (sx, sj) = (normed.map(_._1).sum, normed.map(_._2).sum)
    val nn = math.sqrt(sx * sx + sj * sj)
    val (ex, ej) = (sx / nn, sj / nn)
    cents.zipWithIndex.foreach { case (cent, c) =>
      cent(c) shouldBe ex +- 1e-9
      cent(3) shouldBe ej +- 1e-9
      (0 until 3).filter(_ != c).foreach(d => cent(d) shouldBe 0.0 +- 1e-9)
    }
  }
}
