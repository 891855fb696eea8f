package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PackingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, 1L + (i * 37 % 100))).toDF("doc_id", "n_tok")

  test("every document lands in exactly one pack and budgets hold") {
    val budget = 128L
    val out = Packing.packByTokenBudget(docs(500), "doc_id", "n_tok", budget, partitions = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id")))
    out.map(_._1).sorted shouldBe (0L until 500L)
    val packs = out.groupBy(_._3)
    packs.foreach { case (pid, members) =>
      val total = members.map(_._2).sum
      // a pack may exceed the budget only as a single oversized document
      assert(total <= budget || members.length == 1,
        s"pack $pid overfilled with ${members.length} docs / $total tokens")
    }
    // sanity on packing quality: greedy next-fit on ~uniform(1,100) sizes
    // against budget 128 must do far better than one-doc-per-pack
    assert(packs.size < 300, s"packing degenerated: ${packs.size} packs for 500 docs")
  }

  test("assignment is deterministic for a fixed partition count") {
    def run() = Packing.packByTokenBudget(docs(300), "doc_id", "n_tok", 256, partitions = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"))).sorted.toSeq
    run() shouldBe run()
    // determinism must hold AT SCALE, not just when the corpus is small
    // enough to be fully sampled: the spread must be hash partitioning
    // (value-deterministic), never range partitioning (whose sampled
    // boundaries can shift between runs once the sample is a subset)
    val plan = Packing.packByTokenBudget(docs(300), "doc_id", "n_tok", 256, partitions = 4)
      .queryExecution.executedPlan.toString
    plan should include ("hashpartitioning")
    plan should not include "rangepartitioning"
  }

  test("an oversized document gets a pack of its own") {
    val d = Seq((1L, 5L), (2L, 500L), (3L, 7L), (4L, 6L)).toDF("doc_id", "n_tok")
    val out = Packing.packByTokenBudget(d, "doc_id", "n_tok", 100, partitions = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id")))
    val oversizedPack = out.find(_._1 == 2L).get._2
    out.count(_._2 == oversizedPack) shouldBe 1
    out.map(_._1).sorted shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("zero and negative token counts never wedge the packer") {
    val d = Seq((1L, 0L), (2L, -3L), (3L, 10L)).toDF("doc_id", "n_tok")
    val out = Packing.packByTokenBudget(d, "doc_id", "n_tok", 10, partitions = 1).collect()
    out.length shouldBe 3
  }
}
