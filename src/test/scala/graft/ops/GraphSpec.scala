package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraphSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(
        Graph.canonicalEdges(edges.toDF("src", "dst"), "src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in 3 triangles") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    tri(k4) shouldBe Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L)
  }

  test("a path has no triangles") {
    tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe Map.empty
  }

  test("duplicate, reversed, and self-loop edges do not change the count") {
    val clean = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val noisy = tri(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L),
      (1L, 3L), (1L, 1L), (3L, 3L)))
    clean shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    noisy shouldBe clean
  }

  test("star + one closing edge: exactly the hub triangle (degree orientation)") {
    // hub 0 has degree 5 — under id-orientation it would fan out all
    // wedges; degree orientation points spokes AT the hub and still
    // finds the single triangle {0, 1, 2}
    val star = (1L to 5L).map(i => (0L, i)) :+ (1L, 2L)
    tri(star) shouldBe Map(0L -> 1L, 1L -> 1L, 2L -> 1L)
  }

  test("triangle total is invariant to partitioning") {
    val edges = (for (a <- 0L to 9L; b <- (a + 1) to 9L if (a + b) % 3 != 0)
      yield (a, b))
    val base = tri(edges)
    val repart = Graph.triangleCounts(
        Graph.canonicalEdges(edges.toDF("src", "dst").repartition(7), "src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    repart shouldBe base
  }

  test("pageRank on a ring is uniform 1/N at every iteration count") {
    val n = 6L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    for (iters <- Seq(1, 5)) {
      val ranks = Graph.pageRank(ring.toDF("src", "dst"), iters = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      ranks.keySet shouldBe (0L until n).toSet
      ranks.values.foreach(_ shouldBe (1.0 / n) +- 1e-12)
    }
  }

  test("pageRank: two-cycle splits mass evenly; totals stay <= 1") {
    val ranks = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(1L) shouldBe 0.5 +- 1e-12
    ranks(2L) shouldBe 0.5 +- 1e-12
  }

  test("pageRank drops edges to non-source targets (documented edges-only form)") {
    // 7 -> 99 where 99 never appears as a source: node set = {7}, no
    // surviving edges, so after one iteration rank(7) = (1-d)/1
    val ranks = Graph.pageRank(Seq((7L, 99L)).toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.keySet shouldBe Set(7L)
    ranks(7L) shouldBe 0.15 +- 1e-12
  }

  test("pageRank: more in-links means more rank") {
    // 1,2,3 all point at 4; 4 points at 1 — 4 must outrank everyone
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L), (2L, 1L), (3L, 2L))
    val ranks = Graph.pageRank(e.toDF("src", "dst"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks(4L) should be > ranks(2L)
    ranks(4L) should be > ranks(3L)
  }
}
