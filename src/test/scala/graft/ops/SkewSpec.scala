package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("skewReport: exact counts, shares, and leveling salt for heavy keys") {
    // key 7 holds 50% of rows, key 8 holds 25%, a 25% uniform tail of
    // 100 keys (each 0.25% — below the default 1% share floor)
    val rows = (1 to 4000).map { i =>
      val k = if (i <= 2000) 7L else if (i <= 3000) 8L else 100L + i % 100
      (k, i)
    }
    val out = graft.ops.Skew.skewReport(rows.toDF("k", "v"), "k",
        partitions = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    out.map(x => (x._1, x._2)).toSeq shouldBe Seq((7L, 2000L), (8L, 1000L))
    out(0)._3 shouldBe 0.5 +- 1e-9
    out(0)._4 shouldBe 8L  // ceil(0.5 * 16)
    out(1)._4 shouldBe 4L  // ceil(0.25 * 16)
  }

  test("skewReport on a uniform corpus suggests salt 1 everywhere it reports") {
    val rows = (1 to 3000).map(i => (i % 10L, i))
    val out = graft.ops.Skew.skewReport(rows.toDF("k", "v"), "k",
        partitions = 8, minShare = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    out.length shouldBe 10
    out.foreach(_._2 shouldBe 1L) // ceil(0.1 * 8) = 1: no salting needed
  }

  test("salted aggregate equals direct groupBy on a skewed distribution") {
    // one heavy hitter (90% of rows) + a uniform tail
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "heavy" else s"k${i % 7}"
      (k, i.toDouble)
    }
    val df = rows.toDF("key", "value").repartition(8)
    val salted = Skew.saltedAggregate(df, Seq("key"), Skew.countSumMinMax("value"))
      .orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("value_n"),
        r.getAs[Double]("value_sum"), r.getAs[Double]("value_min"), r.getAs[Double]("value_max")))
    val direct = df.groupBy("key")
      .agg(count(col("value")).as("n"), sum(col("value")).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("s"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))
    salted shouldBe direct
  }

  test("approx_count_distinct estimate lands within the configured rsd") {
    // rsd 0.05 (Spark's default, what a6 registers): the 3-sigma bound
    // is deterministic for a fixed input — HLL++ has no run-time seed
    val df = (1 to 20000).map(i => i % 5000).toDF("v")
    val r = df.agg(
      approx_count_distinct(col("v"), 0.05).as("approx"),
      count_distinct(col("v")).as("exact")).head()
    val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
    exact shouldBe 5000L
    math.abs(approx - exact).toDouble / exact should be < 0.15
  }

  test("partial stage actually spreads a heavy key over multiple salts") {
    val df = (1 to 1000).map(i => ("heavy", i.toDouble)).toDF("key", "value").repartition(8)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
    salted.select("__salt").distinct().count() should be > 4L
  }

  test("saltCol spreads a heavy key of IDENTICAL duplicate rows") {
    // the content-hash fallback gives all duplicates ONE salt (a silent
    // single-task straggler); an id-based salt actually spreads them
    val dup = (1L to 1000L).map(id => (id, "heavy", 1.0)).toDF("id", "key", "value")
    val contentSalts = dup.select(
      pmod(xxhash64(col("key"), col("value"), lit(42L)), lit(32)).as("s"))
      .distinct().count()
    contentSalts shouldBe 1L
    val idSalts = dup.select(
      pmod(xxhash64(col("id"), lit(42L)), lit(32)).as("s")).distinct().count()
    idSalts should be > 16L
    // and the aggregate stays correct with saltCol
    val out = Skew.saltedAggregate(dup, Seq("key"), Skew.countSumMinMax("value"),
      saltCol = Some("id")).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("value_n") shouldBe 1000L
    out.head.getAs[Double]("value_sum") shouldBe 1000.0
  }

  test("salted join equals the plain join on a skewed fact side") {
    // one part key carries 80% of the fact rows + a uniform tail
    val fact = (1 to 5000).map { i =>
      val k = if (i % 5 != 0) 7L else (i % 23).toLong
      (k, i.toDouble)
    }.toDF("fk", "v").repartition(8)
    val dim = (0L to 23L).map(k => (k, s"name_$k")).toDF("dk", "name")
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk", saltFactor = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    salted shouldBe plain
    // the heavy key's rows really spread: same salt formula as saltedJoin
    val spread = fact.filter(col("fk") === 7L)
      .select(pmod(xxhash64(col("fk"), col("v"), lit(42L)), lit(8)).as("s"))
      .distinct().count()
    spread shouldBe 8L
  }

  test("salted join output carries no salt column and respects saltCol") {
    val fact = (1L to 100L).map(i => (i, i % 3, "payload")).toDF("id", "fk", "p")
    val dim = (0L to 2L).map(k => (k, s"d$k")).toDF("dk", "name")
    val out = Skew.saltedJoin(fact, dim, "fk", "dk", saltFactor = 4, saltCol = Some("id"))
    out.columns should not contain "__salt"
    out.count() shouldBe 100L
  }

  test("hotSaltedJoin equals the plain join; only hot keys pay replication") {
    // key 7 carries 80% of rows; the tail is uniform over 23 cold keys
    val fact = (1 to 5000).map { i =>
      val k = if (i % 5 != 0) 7L else (i % 23).toLong
      (k, i.toDouble)
    }.toDF("fk", "v").repartition(8)
    val dim = (0L to 23L).map(k => (k, s"name_$k")).toDF("dk", "name")
    val got = Skew.hotSaltedJoin(fact, dim, "fk", "dk", saltFactor = 8, maxHotKeys = 4)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got shouldBe plain
    // the MG sketch must surface the 80% key among the candidates
    val mg = udaf(new graft.functions.MisraGries(4),
      org.apache.spark.sql.Encoders.STRING)
    val cand = fact.select(col("fk").cast("string").as("k"))
      .agg(mg(col("k"))).head().getAs[Map[String, Long]](0)
    cand.keySet should contain ("7")
  }

  test("hotSaltedJoin on a skew-free fact degrades to the plain join result") {
    val fact = (1L to 2000L).map(i => (i % 50, i.toDouble)).toDF("fk", "v")
    val dim = (0L to 49L).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = Skew.hotSaltedJoin(fact, dim, "fk", "dk", saltFactor = 8, maxHotKeys = 8)
    got.count() shouldBe 2000L
    got.columns should not contain "__salt"
  }

  test("hotSaltedJoin matches the plain join when key types differ (long fact vs decimal dim)") {
    // r6 bug: hot-key matching compared cast("string") of both sides, so a
    // long fact key "7" never matched a decimal(10,2) dim key "7.00" and
    // every hot fact row silently lost its matches. Typed literals follow
    // the join's own coercion, so the branches now agree with the plain join.
    val fact = (1 to 4000).map { i =>
      val k = if (i % 5 != 0) 7L else (i % 23).toLong
      (k, i.toDouble)
    }.toDF("fk", "v").repartition(8)
    val dim = (0L to 23L).map(k => (k, s"name_$k")).toDF("dk", "name")
      .withColumn("dk", col("dk").cast("decimal(10,2)"))
    dim.select(col("dk").cast("string")).head().getString(0) should include (".")
    val got = Skew.hotSaltedJoin(fact, dim, "fk", "dk", saltFactor = 8, maxHotKeys = 4)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got should not be empty
    got shouldBe plain
  }

  test("hotSaltedJoin rejects identical key column names regardless of skew") {
    // with equal names the hot path's unionByName would fail only when skew
    // is detected — the operator now rejects the shape up front instead
    val fact = (1L to 100L).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val dim = (0L to 2L).map(k => (k, s"d$k")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Skew.hotSaltedJoin(fact, dim, "k", "k")
    }
    e.getMessage should include ("distinct names")
  }

  test("hotSaltedJoin null fact keys are dropped exactly like the inner join") {
    val fact = Seq[(java.lang.Long, Double)]((7L, 1.0), (7L, 2.0), (7L, 3.0),
      (1L, 4.0), (null, 5.0), (null, 6.0)).toDF("fk", "v")
    val dim = (0L to 9L).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = Skew.hotSaltedJoin(fact, dim, "fk", "dk", saltFactor = 4, maxHotKeys = 2)
    got.count() shouldBe 4L // the two null-key rows are gone, as in a plain inner join
  }

  test("MapType columns need an explicit saltCol (xxhash64 cannot hash maps)") {
    val df = Seq((1L, "k", 2.0, Map("a" -> 1))).toDF("id", "key", "value", "props")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("key"), Skew.countSumMinMax("value"))
    }
    e.getMessage should include ("saltCol")
    // with saltCol the map column is never hashed
    Skew.saltedAggregate(df, Seq("key"), Skew.countSumMinMax("value"),
      saltCol = Some("id")).collect().head.getAs[Long]("value_n") shouldBe 1L
  }
}
