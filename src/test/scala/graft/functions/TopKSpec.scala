package graft.functions

import graft.TestSpark
import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TopKSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random scores with planted ties
  private def data = (1L to 10000L)
    .map(i => (s"g${i % 7}", ((i * 2654435761L) % 1000).toDouble, i))
    .toDF("g", "score", "id")

  private def viaTopK(k: Int) = {
    val tk = F.udaf(new TopK(k), Encoders.product[Scored])
    data.groupBy("g")
      .agg(tk($"score", $"id").as("top"))
      .select($"g", F.posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("id"), $"col.score".as("score"))
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id".asc)
    data.withColumn("rank", F.row_number().over(w).cast("long"))
      .filter($"rank" <= k).select("g", "rank", "id", "score")
  }

  test("equals the window row_number derivation, ties broken by id") {
    for (k <- Seq(1, 5, 40)) {
      viaTopK(k).orderBy("g", "rank").collect().map(_.toSeq) shouldBe
        viaWindow(k).orderBy("g", "rank").collect().map(_.toSeq)
    }
  }

  test("partition-shape independent (merge associativity/commutativity)") {
    val tk = F.udaf(new TopK(5), Encoders.product[Scored])
    def run(parts: Int) = data.repartition(parts).groupBy("g")
      .agg(tk($"score", $"id").as("top"))
      .orderBy("g").collect().map(_.toSeq)
    run(1) shouldBe run(13)
    run(13) shouldBe run(64)
  }

  test("k larger than the group returns the whole group, sorted") {
    val tiny = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L)).toDF("g", "score", "id")
    val tk = F.udaf(new TopK(10), Encoders.product[Scored])
    val top = tiny.groupBy("g").agg(tk($"score", $"id").as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
    top.map(r => (r.getDouble(0), r.getLong(1))) shouldBe
      Seq((3.0, 2L), (2.0, 3L), (1.0, 1L))
  }
}
