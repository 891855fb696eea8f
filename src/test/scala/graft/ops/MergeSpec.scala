package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MergeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapshot =
    Seq((1L, Option(10.0), "a"), (2L, Option(20.0), "b"),
        (3L, Option(30.0), "c"), (4L, None, "d"))
      .toDF("k", "v", "tag0")

  // (key, op, ts, seq, value)
  private def changes =
    Seq((2L, "upsert", 5L, 1L, Option(21.0)), // update
        (2L, "upsert", 3L, 2L, Option(99.0)), // older ts loses despite larger seq
        (3L, "delete", 9L, 3L, None),         // delete
        (3L, "upsert", 9L, 1L, Option(31.0)), // same ts, lower seq -> delete wins
        (5L, "upsert", 1L, 4L, Option(50.0)), // insert
        (6L, "delete", 1L, 5L, None))         // delete of an absent key -> no row
      .toDF("k", "op", "ts", "seq", "v")

  test("applyChangelog: latest-wins upsert / delete / insert / kept") {
    val out = Merge.applyChangelog(snapshot, changes, "k", "op",
        Seq("ts", "seq"), Seq("v"), tagCol = Some("src"))
      .orderBy("k")
      .as[(Long, Option[Double], String, String)].collect()
    out shouldBe Array(
      (1L, Some(10.0), "a", "kept"),
      (2L, Some(21.0), "b", "updated"),
      (4L, None, "d", "kept"),
      (5L, Some(50.0), null, "inserted"))
  }

  test("applyChangelog tags a null-valued existing row as updated, not inserted") {
    val ch = Seq((4L, "upsert", 1L, 1L, Option(44.0))).toDF("k", "op", "ts", "seq", "v")
    val out = Merge.applyChangelog(snapshot, ch, "k", "op", Seq("ts", "seq"), Seq("v"),
        tagCol = Some("src"))
      .filter($"k" === 4L)
      .as[(Long, Option[Double], String, String)].collect()
    out shouldBe Array((4L, Some(44.0), "d", "updated"))
  }

  test("applyChangelog without tagCol keeps the snapshot schema exactly") {
    val out = Merge.applyChangelog(snapshot, changes, "k", "op", Seq("ts", "seq"), Seq("v"))
    out.columns.toSeq shouldBe snapshot.columns.toSeq
  }

  test("applyChangelog equals a MERGE spelled out as window + full join") {
    // independent relational derivation of the same semantics
    changes.createOrReplaceTempView("mg_ch")
    snapshot.createOrReplaceTempView("mg_s")
    val expect = spark.sql(
      """WITH latest AS (
        |  SELECT k, op, v FROM (
        |    SELECT k, op, v,
        |           row_number() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC) rn
        |    FROM mg_ch) WHERE rn = 1)
        |SELECT COALESCE(s.k, l.k) AS k,
        |       CASE WHEN l.k IS NOT NULL THEN l.v ELSE s.v END AS v,
        |       s.tag0 AS tag0
        |FROM mg_s s FULL OUTER JOIN latest l ON s.k = l.k
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY k""".stripMargin)
      .as[(Long, Option[Double], String)].collect()
    val got = Merge.applyChangelog(snapshot, changes, "k", "op", Seq("ts", "seq"), Seq("v"))
      .orderBy("k").as[(Long, Option[Double], String)].collect()
    got shouldBe expect
  }

  test("scd2: versions ordered per key, half-open intervals chain, current is open") {
    val ch = Seq((1L, 100L, 1L, "v1"), (1L, 200L, 2L, "v2"), (1L, 200L, 3L, "v2b"),
                 (2L, 150L, 4L, "w1"))
      .toDF("k", "ts", "seq", "payload")
    val out = Merge.scd2(ch, "k", "ts", Seq("ts", "seq"), Seq("payload"))
      .orderBy("k", "version")
      .as[(Long, Long, String, Long, Option[Long])].collect()
    out shouldBe Array(
      (1L, 1L, "v1", 100L, Some(200L)),
      (1L, 2L, "v2", 200L, Some(200L)), // tie on ts: seq orders versions
      (1L, 3L, "v2b", 200L, None),
      (2L, 1L, "w1", 150L, None))
  }
}
