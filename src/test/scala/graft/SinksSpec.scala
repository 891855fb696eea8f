package graft

import graft.sources.Sinks
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files

class SinksSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sinks").resolve("t").toString

  private def data = (1 to 3000)
    .map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "g", "v")

  test("partitioned write: round-trip equality, one file per partition value") {
    val path = tmp()
    Sinks.writePartitioned(data, path, Seq("g"))
    val back = spark.read.parquet(path)
    back.count() shouldBe 3000
    back.select("id", "g", "v").as[(Long, String, Double)].collect().toSet shouldBe
      data.as[(Long, String, Double)].collect().toSet
    // one owning task per value -> exactly one parquet file per directory
    for (g <- Seq("g0", "g1", "g2")) {
      val files = new java.io.File(s"$path/g=$g")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      files should have length 1
    }
  }

  test("filesPerPartition widens a value across that many files") {
    val path = tmp()
    // AQE rightly re-merges KB-sized salted partitions; pin it off to
    // observe the salt's splitting behavior at toy scale
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Sinks.writePartitioned(data, path, Seq("g"), filesPerPartition = 4)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val files = new java.io.File(s"$path/g=g0")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    files.length should be > 1
    files.length should be <= 4
    spark.read.parquet(path).count() shouldBe 3000
  }

  test("reader prunes partitions: PartitionFilters set, only matching files read") {
    val path = tmp()
    Sinks.writePartitioned(data, path, Seq("g"))
    val q = spark.read.parquet(path).filter($"g" === "g1")
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    scan.partitionFilters.map(_.sql).mkString(" ") should include("g1")
    // the scan's selected partitions cover ONLY the g=g1 directory
    scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
      .foreach(p => p should include("g=g1"))
    q.count() shouldBe 1000
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    val path = tmp()
    Sinks.writePartitioned(data, path, Seq("g"))
    val patch = Seq((9001L, "g1", -1.0), (9002L, "g1", -2.0)).toDF("id", "g", "v")
    Sinks.overwritePartitions(patch, path, Seq("g"))
    val back = spark.read.parquet(path)
    back.filter($"g" === "g1").count() shouldBe 2 // replaced
    back.filter($"g" =!= "g1").count() shouldBe 2000 // untouched
  }
}
