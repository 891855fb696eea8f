package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the scale contract behind j2_bucketed_join: two tables bucketed
  * (and per-bucket sorted) by the join key with MATCHING bucket counts
  * join with NO shuffle on either side — the bucketed materialization is
  * the amortized cost that removes the join exchange from every
  * downstream run. The contrast case pins that the same join over plain
  * (unbucketed) relations DOES plan an exchange, so the assertion is
  * about bucketing, not about the data being conveniently small.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private val facts = (0L until 1000L).map(i => (i % 97, i.toDouble)).toDF("k", "v")
  private val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "name")

  /** Drop + clear the location first: a leftover warehouse directory from
    * a previous test JVM is unknown to this session's in-memory catalog
    * and would fail saveAsTable with LOCATION_ALREADY_EXISTS. */
  private def freshTable(name: String)(write: String => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    write(name)
  }

  test("bucketed co-located join plans no exchange on either side") {
    freshTable("graft_test_bkt_facts")(facts.write.format("parquet")
      .bucketBy(4, "k").sortBy("k").saveAsTable(_))
    freshTable("graft_test_bkt_dims")(dims.write.format("parquet")
      .bucketBy(4, "k").sortBy("k").saveAsTable(_))
    withNoBroadcast {
      val j = spark.table("graft_test_bkt_facts")
        .join(spark.table("graft_test_bkt_dims"), "k")
      val rows = j.collect()
      rows.length shouldBe 1000
      val plan = j.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include ("SortMergeJoin")
      // the same join over the unbucketed originals DOES shuffle — the
      // exchange-free plan above is the bucketing, not small-data luck
      val plain = facts.join(dims, "k")
      plain.collect().length shouldBe 1000
      plain.queryExecution.executedPlan.toString should include ("Exchange")
    }
  }

  test("bucketed join result equals the plain join result") {
    val bucketed = spark.table("graft_test_bkt_facts")
      .join(spark.table("graft_test_bkt_dims"), "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val plain = facts.join(dims, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    bucketed shouldBe plain
  }
}
