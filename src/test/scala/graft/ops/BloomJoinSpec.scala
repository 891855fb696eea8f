package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BloomJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact = (1L to 20000L).map(i => (i, i % 1000)).toDF("fk", "payload")
  // 50 selective keys spread through the fact key range
  private def dim = (1L to 50L).map(i => i * 100L).toDF("dk")

  test("bloomSemiJoin equals the plain semi join") {
    val got = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk", expectedDimKeys = 50L)
      .as[(Long, Long)].collect().toSet
    val want = fact.join(dim, $"fk" === $"dk", "left_semi")
      .as[(Long, Long)].collect().toSet
    want should have size 50
    got shouldBe want
  }

  test("bloomAntiJoin equals the plain anti join, null fact keys kept") {
    val factN = fact.unionByName(Seq((Option.empty[Long], 7L))
      .toDF("fk", "payload"))
    val got = BloomJoin.bloomAntiJoin(factN, dim, "fk", "dk", expectedDimKeys = 50L)
      .as[(Option[Long], Long)].collect().toSet
    val want = factN.join(dim, $"fk" === $"dk", "left_anti")
      .as[(Option[Long], Long)].collect().toSet
    want should have size (20000 - 50 + 1)
    got shouldBe want
  }

  test("bloom probe prunes most non-matching rows before the join") {
    val bloom = BloomJoin.buildBloom(dim, "dk", expectedKeys = 50L, fpp = 0.01)
    val pass = fact.filter(BloomJoin.mightContain(bloom, $"fk")).count()
    // 50 true positives + ~1% fp of 19950; generous bound proves pruning
    pass.toDouble should be < 20000 * 0.05
    pass should be >= 50L
  }

  test("empty dim: semi join empty, anti join identity") {
    val empty = dim.filter($"dk" < 0)
    BloomJoin.bloomSemiJoin(fact, empty, "fk", "dk", 10L).count() shouldBe 0L
    BloomJoin.bloomAntiJoin(fact, empty, "fk", "dk", 10L).count() shouldBe 20000L
  }

  test("property: semi/anti equal the plain joins on random key sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      nf <- Gen.chooseNum(0, 300)
      fk <- Gen.listOfN(nf, Gen.chooseNum(0L, 99L))
      nd <- Gen.chooseNum(0, 30)
      dk <- Gen.listOfN(nd, Gen.chooseNum(0L, 120L)).map(_.distinct)
    } yield (fk, dk)
    val cases = (0 until 6).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(23L + i)))
    for ((fk, dk) <- cases) {
      val f = fk.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("fk", "row")
      val d = dk.toDF("dk")
      val dset = dk.toSet
      val semi = BloomJoin.bloomSemiJoin(f, d, "fk", "dk", expectedDimKeys = 200L)
        .as[(Long, Long)].collect().toSet
      semi shouldBe fk.zipWithIndex.collect {
        case (k, i) if dset(k) => (k, i.toLong) }.toSet
      val anti = BloomJoin.bloomAntiJoin(f, d, "fk", "dk", expectedDimKeys = 200L)
        .as[(Long, Long)].collect().toSet
      anti shouldBe fk.zipWithIndex.collect {
        case (k, i) if !dset(k) => (k, i.toLong) }.toSet
    }
  }

  test("buildBloom lifts the session bloom caps so large expectedKeys keeps its fpp") {
    // 10M keys at fpp=0.01 needs ~95.8M bits ≈ 12 MB — above the default
    // maxNumBits cap (64M bits = 8 MB) that BloomFilterAggregate silently
    // clamps to; the serialized size proves the cap was actually lifted
    val bloom = BloomJoin.buildBloom(dim, "dk", expectedKeys = 10_000_000L, fpp = 0.01)
    bloom.length.toLong should be > (67108864L / 8) // bigger than the default cap allows
    spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong should be >= 10_000_000L
  }

  test("string keys work (xxhash64 probe is type-agnostic)") {
    val f = (1 to 1000).map(i => s"doc$i").toDF("fk")
    val d = Seq("doc7", "doc77", "doc777", "nope").toDF("dk")
    BloomJoin.bloomSemiJoin(f, d, "fk", "dk", 10L)
      .as[String].collect().toSet shouldBe Set("doc7", "doc77", "doc777")
  }
}
