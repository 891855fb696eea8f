package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

class CurationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withMaterialized returns the same rows as the lazy composite") {
    val corpus = (1L to 200L).map(i => (i, s"doc $i", i % 5)).toDF("id", "text", "k")
    def build(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s")).orderBy("k")
    val lazyRows = build(corpus).collect().toSeq
    val matRows = Curation.withMaterialized(corpus, build(_)).collect().toSeq
    matRows shouldBe lazyRows
  }

  test("withMaterialized preserves schema exactly") {
    val corpus = Seq((1L, "a")).toDF("id", "text")
    val out = Curation.withMaterialized(corpus,
      _.groupBy("text").agg(count(lit(1)).as("n")))
    out.schema shouldBe corpus.groupBy("text").agg(count(lit(1)).as("n")).schema
  }

  test("withMaterialized releases its persist (zero residual storage)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Curation.withMaterialized((1L to 50L).toDF("id"),
      _.agg(sum("id").as("s"))).collect()
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }

  test("withMaterialized refuses a row-data-sized result") {
    val corpus = (1L to 500L).toDF("id")
    an[IllegalArgumentException] should be thrownBy
      Curation.withMaterialized(corpus, identity, maxResultRows = 100)
    // and the refusal path must ALSO release the persist
    spark.sparkContext.getPersistentRDDs.size shouldBe 0
  }
}
