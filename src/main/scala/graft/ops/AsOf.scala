package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the payload of the
  * single right row with the same key and the greatest time <= the left
  * row's time.
  *
  * Spark has no native as-of join; the scalable composition is
  * union + ordered window with `last(payload, ignoreNulls)`:
  * ONE shuffle on the key (both sides co-partitioned by the window),
  * no time-range cross join, no per-key collect. A range-condition
  * equi-join (`l.key = r.key AND r.ts <= l.ts` + keep-latest) explodes
  * to O(|matches|) intermediate rows; this stays O(left + right).
  */
object AsOf {

  /** @param left    probe side; all its columns are preserved
    * @param right   reference side; must be unique per (key, time) for a
    *                well-defined result (pre-aggregate if needed)
    * @param keyCol  equi-join key present on both sides
    * @param timeCol ordering column present on both sides
    * @param payloadCols right columns to attach (null when no right row
    *                at or before the left row's time). Names must not
    *                collide with left columns. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val leftCols = left.columns.toSeq
    val lTagged = left.select(leftCols.map(col) ++ Seq(
      lit(1).as("__il"), lit(null).cast(payloadType).as("__p")): _*)
    val rTagged = right.select(leftCols.map { c =>
      if (c == keyCol || c == timeCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(lit(0).as("__il"), payload.as("__p")): _*)

    // right rows sort before left rows at equal time -> "<=" semantics
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__il"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__il") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(p => col(s"__asof.$p").as(p)): _*)
  }
}
