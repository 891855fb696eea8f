package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class OutlierQnSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("centroidOutliers: distances to the group centroid, z-scored in-group") {
    // square corners around (1,1) + one far point => centroid (3,1)
    val pts = Seq((1L, Seq(0f, 0f)), (2L, Seq(2f, 0f)), (3L, Seq(0f, 2f)),
      (4L, Seq(2f, 2f)), (5L, Seq(11f, 1f)), (6L, Seq(1f, 1f, 9f)))
    val df = pts.map { case (id, v) => (id, "g", v) }.toDF("id", "grp", "vec")
    val out = Similarity.centroidOutliers(df.repartition(3), "id", "grp",
        "vec", dim = 2, zThreshold = 1.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // wrong-dim row dropped
    val dists = Map(1L -> math.sqrt(10.0), 2L -> math.sqrt(2.0),
      3L -> math.sqrt(10.0), 4L -> math.sqrt(2.0), 5L -> 8.0)
    for ((id, d) <- dists)
      out(id).getAs[Double]("dist") shouldBe d +- 1e-9
    val mu = dists.values.sum / 5
    val sd = math.sqrt(dists.values.map(d => (d - mu) * (d - mu)).sum / 4)
    out(5L).getAs[Double]("z") shouldBe ((8.0 - mu) / sd) +- 1e-9
    out(5L).getAs[Boolean]("is_outlier") shouldBe true
    out(2L).getAs[Boolean]("is_outlier") shouldBe false
  }

  test("centroidOutliers: a perfectly symmetric group has zero spread -> NULL z") {
    val df = Seq((1L, Seq(0f, 0f)), (2L, Seq(2f, 0f)), (3L, Seq(0f, 2f)),
      (4L, Seq(2f, 2f))).map { case (id, v) => (id, "g", v) }
      .toDF("id", "grp", "vec")
    val out = Similarity.centroidOutliers(df, "id", "grp", "vec", 2).collect()
    all(out.map(_.isNullAt(3))) shouldBe true
  }

  test("quantileNormalize forces both features onto the rank-mean distribution") {
    val df = Seq((1L, Some(4.0), Some(10.0)), (2L, Some(3.0), Some(30.0)),
      (3L, Some(2.0), Some(20.0)), (4L, Some(1.0), Some(40.0)),
      (5L, Option.empty[Double], Some(7.0)))
      .toDF("id", "x", "y")
    val out = Quantiles.quantileNormalize(df.repartition(3), "id", Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    out.size shouldBe 8 // id 5 dropped from BOTH features
    out((1L, "x")) shouldBe (4L, 22.0) // largest x -> rank 4 -> (4+40)/2
    out((1L, "y")) shouldBe (1L, 5.5) // smallest y -> rank 1 -> (1+10)/2
    out((3L, "x")) shouldBe (2L, 11.0)
    out((3L, "y")) shouldBe (2L, 11.0)
    // identical post-normalization distributions
    val xs = out.collect { case ((_, "x"), (_, n)) => n }.toSeq.sorted
    val ys = out.collect { case ((_, "y"), (_, n)) => n }.toSeq.sorted
    xs shouldBe ys
    an[IllegalArgumentException] should be thrownBy
      Quantiles.quantileNormalize(df, "id", Seq("x"))
  }

  test("quantileNormalize breaks ties by id deterministically") {
    val df = Seq((10L, 7.0, 1.0), (20L, 7.0, 2.0)).toDF("id", "x", "y")
    val out = Quantiles.quantileNormalize(df, "id", Seq("x", "y"))
      .filter("feature = 'x'").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(10L) shouldBe 1L
    out(20L) shouldBe 2L
  }

  test("quantileNormalize stitched tie rank == naive per-(feature,value) window rank, any partitioning") {
    // Tie-heavy fixture with SPARSE, non-uniform ids: values repeat
    // heavily (2 distinct values per feature over 60 rows) so the tie
    // groups span MANY id buckets, and the ids are irregularly spaced so
    // the equal-width buckets are unevenly filled — exactly the regime
    // where the stitched construction (bucket census + prefix offsets +
    // in-bucket row_number) must reproduce the naive
    // Window.partitionBy(feature, value).orderBy(id) rank bit-for-bit.
    val rows = (0 until 60).map { i =>
      val id = i.toLong * i * 7 + (i % 3) // sparse, strictly increasing
      (id, (i % 2).toDouble, (i % 3 min 1).toDouble)
    }
    val df = rows.toDF("id", "x", "y")
    def ranksOf(parts: Int): Map[(Long, String), (Long, Double)] =
      Quantiles.quantileNormalize(df.repartition(parts), "id", Seq("x", "y"))
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(4))).toMap
    val got = ranksOf(7)
    // partition-independence: 1 partition and 7 partitions agree exactly
    ranksOf(1) shouldBe got
    // naive reference ranks computed in-process: sort each feature's
    // (value, id) pairs; rank = 1-based position
    val naive = for {
      (fName, fIdx) <- Seq(("x", 1), ("y", 2))
      sorted = rows.map(t => (t._1, t.productElement(fIdx).asInstanceOf[Double]))
        .sortBy { case (id, v) => (v, id) }
      ((id, _), pos) <- sorted.zipWithIndex
    } yield (id, fName) -> (pos + 1L)
    naive.foreach { case (k, r) => got(k)._1 shouldBe r }
  }

  test("quantileNormalize with MIXED-castability string ids loses no rows " +
      "and leaves no rank gaps") {
    // Ids "7".."12" cast to double; "a","b" do not. The bucket key must
    // be NEVER-null (sentinel bucket -1) or the census inner join would
    // silently drop the uncastable rows and leave gaps in the surviving
    // ranks. Pinned order for the mixed case: uncastable ids rank FIRST
    // (bucket -1 sorts before every real bucket), id-ordered within.
    val df = Seq(("a", 5.0, 1.0), ("b", 5.0, 2.0), ("7", 5.0, 3.0),
      ("12", 5.0, 4.0), ("9", 2.0, 5.0), ("8", 2.0, 6.0))
      .toDF("id", "x", "y")
    val out = Quantiles.quantileNormalize(df.repartition(3), "id", Seq("x", "y"))
      .collect()
    out.length shouldBe 12 // 6 rows x 2 features — nothing dropped
    val xRanks = out.filter(_.getString(1) == "x")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    xRanks.values.toSeq.sorted shouldBe (1L to 6L) // gapless
    // x ties: {9,8} at 2.0 rank 1-2 (numeric order 8<9), then at 5.0 the
    // uncastable {a,b} rank 3-4 (bucket -1 first, id order), then 7<12
    xRanks("8") shouldBe 1L
    xRanks("9") shouldBe 2L
    xRanks("a") shouldBe 3L
    xRanks("b") shouldBe 4L
    xRanks("7") shouldBe 5L
    xRanks("12") shouldBe 6L
  }
}
