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

  test("a null spread key fails loudly instead of corrupting pack ids") {
    // null __grp would unbox to 0 while hash-partitioning on NULL — two
    // partitions could then both mint "group 0" pack ids; the in-plan
    // guard rejects the row before that can happen
    val d = Seq((Some(1L), 5L), (None, 6L), (Some(3L), 7L))
      .toDF("doc_id", "n_tok")
    val e = intercept[Throwable] {
      Packing.packByTokenBudget(d, "doc_id", "n_tok", 100, partitions = 2,
        spreadKey = Some(col("doc_id") * 7L)).collect()
    }
    e.getMessage should include("spread key")
  }

  test("an explicit spread key reproduces the xxhash64 path's invariants") {
    val budget = 64L
    val out = Packing.packByTokenBudget(docs(200), "doc_id", "n_tok", budget,
        partitions = 4,
        spreadKey = Some(pmod(col("doc_id") * 48271L, lit(2147483647L))))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("pack_id")))
    out.map(_._1).sorted shouldBe (0L until 200L)
    out.groupBy(_._3).foreach { case (pid, members) =>
      assert(members.map(_._2).sum <= budget || members.length == 1,
        s"pack $pid overfilled")
    }
    // group ids are the EXPLICIT pmod, never a physical partition id
    out.foreach { case (id, _, pid) =>
      (pid >> 32) shouldBe (id * 48271L % 2147483647L) % 4
    }
  }

  test("zero and negative token counts never wedge the packer") {
    val d = Seq((1L, 0L), (2L, -3L), (3L, 10L)).toDF("doc_id", "n_tok")
    val out = Packing.packByTokenBudget(d, "doc_id", "n_tok", 10, partitions = 1).collect()
    out.length shouldBe 3
  }

  test("chunkByTokens: exact boundaries, overlap carry, full coverage") {
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(d, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_id")
      .collect().map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("chunk_text")))
    // stride 3, ceil((10-1)/3) = 3 chunks; consecutive chunks share 1 token
    out shouldBe Array(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t6 t7 t8 t9"))
  }

  test("chunkByTokens: short docs collapse to one chunk, empty docs vanish") {
    val d = Seq((1L, "a b c"), (2L, ""), (3L, "   \n\t "), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = Packing.chunkByTokens(d, "doc_id", "text", chunkTokens = 8, overlap = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk_text"))).toSet
    out shouldBe Set((1L, 0L, "a b c"), (4L, 0L, "solo"))
  }

  test("chunkByTokens with zero overlap partitions the tokens exactly") {
    val text = (0 until 11).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(d, "doc_id", "text", chunkTokens = 4)
      .orderBy("chunk_id").collect()
    out.map(_.getAs[String]("chunk_text")).mkString(" ") shouldBe text
    out.map(_.getAs[Long]("n_tokens")).toSeq shouldBe Seq(4L, 4L, 3L)
    // no chunk is pure overlap: a doc of exactly chunkTokens+overlap-1
    // tokens must NOT spill a final all-overlap chunk
    val edge = Seq((1L, (0 until 5).map("e" + _).mkString(" "))).toDF("doc_id", "text")
    Packing.chunkByTokens(edge, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .count() shouldBe 2 // ceil((5-2)/2) = 2, covering e0..e3 and e2..e4
  }

  test("chunkByTokens invariants hold over random docs and window shapes") {
    val rnd = new scala.util.Random(42)
    val docs = (1L to 40L).map(i => (i, Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(50)).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((4, 0), (4, 1), (7, 3), (10, 9), (64, 8))) {
      val stride = chunk - overlap
      val out = Packing.chunkByTokens(df, "doc_id", "text", chunk, overlap)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"), r.getAs[String]("chunk_text")))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val chunks = out.getOrElse(id, Array.empty[String]).toSeq
        withClue(s"doc $id chunk=$chunk overlap=$overlap: ") {
          if (toks.isEmpty) chunks shouldBe empty
          else {
            // stitching chunks (dropping the carried overlap after the
            // first) reconstructs the token stream exactly
            val stitched = chunks.head.split(" ").toSeq ++
              chunks.tail.flatMap(_.split(" ").toSeq.drop(overlap))
            stitched shouldBe toks
            // every chunk fits the budget; all but the last are full
            chunks.foreach(_.split(" ").length should be <= chunk)
            chunks.dropRight(1).foreach(_.split(" ").length shouldBe chunk)
            // no chunk is pure overlap (each adds >= 1 new token)
            chunks.size shouldBe math.max(1,
              math.ceil(math.max(toks.size - overlap, 1).toDouble / stride).toInt)
          }
        }
      }
    }
  }

  test("chunkByTokens plan is a pure projection: no shuffle, no window") {
    val d = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Packing.chunkByTokens(d, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Window"
  }
}
