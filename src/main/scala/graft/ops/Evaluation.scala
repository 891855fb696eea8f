package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Model-evaluation statistics at corpus scale — the scoring half of a
  * training pipeline (score a candidate filter/classifier over the full
  * corpus, gate on the metric) where a single-node sklearn pass stopped
  * being an option several orders of magnitude ago.
  *
  * Both operators keep every count in exact integer arithmetic until
  * one final division, so an external engine re-derives the metric
  * bit-for-bit — no sampling, no sketch, no approximate rank.
  */
object Evaluation {

  /** Exact ROC-AUC (the Mann–Whitney U statistic with the standard
    * tie correction): the probability a uniformly chosen positive
    * outranks a uniformly chosen negative, ties counting half.
    *
    * AUC = Σ_v nPos(v) · (negBelow(v) + nNeg(v)/2) / (P·N), summed over
    * DISTINCT scores v — computed here as the exact integer
    * `Σ nPos(v) · (2·negBelow(v) + nNeg(v))` over `2·P·N` (one double
    * division at the very end; the sum rides a 38-digit decimal so
    * 10^10-positive × 10^10-negative corpora cannot overflow it).
    *
    * Scale shape: the corpus reduces to one (score → nPos, nNeg) row
    * per DISTINCT score (map-side-combined aggregate); the strictly-
    * below negative counts come from range-partitioned within-partition
    * window cumsums stitched with ≤ #partitions driver prefix offsets —
    * the [[Quantiles.groupedQuantilesExact]] construction, so no
    * single-partition global ranking window ever materializes. Returns
    * ONE row (auc, n_pos, n_neg). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .select(col(scoreCol).cast(DoubleType).as("v"),
        col(labelCol).cast("long").as("y"))
      .filter(col("v").isNotNull && col("y").isNotNull)
      .groupBy("v").agg(
        sum(when(col("y") =!= 0L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("n_neg"))
    val nParts = spark.sessionState.conf.numShufflePartitions
    // persist before repartitionByRange: the range sampler and the two
    // downstream actions must all see ONE stable aggregate (the same
    // offsets contract as ksStatistic)
    val pre = counts.persist()
    val parts = pre.repartitionByRange(nParts, col("v"))
      .sortWithinPartitions("v")
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val subtotals = parts.groupBy("pid")
        .agg(sum("n_pos").as("tp"), sum("n_neg").as("tn"))
        .collect().map(r => (r.getAs[Int]("pid"),
          r.getAs[Long]("tp"), r.getAs[Long]("tn"))).sortBy(_._1)
      val nPos = subtotals.map(_._2).sum
      val nNeg = subtotals.map(_._3).sum
      require(nPos > 0 && nNeg > 0,
        s"rocAuc needs both classes present (pos=$nPos, neg=$nNeg)")
      val offN = subtotals.scanLeft(0L)(_ + _._3).init
      val offNMap = map(subtotals.indices.flatMap(i =>
        Seq(lit(subtotals(i)._1), lit(offN(i)))): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pid").orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val num = parts
        .withColumn("neg_below",
          sum("n_neg").over(w) + element_at(offNMap, col("pid")) - col("n_neg"))
        .agg(sum((col("neg_below") * 2L + col("n_neg")).cast(DecimalType(38, 0)) *
          col("n_pos").cast(DecimalType(38, 0))).as("num2"))
        .head().getDecimal(0)
      import spark.implicits._
      Seq((num.doubleValue() / (2.0 * nPos.toDouble * nNeg.toDouble), nPos, nNeg))
        .toDF("auc", "n_pos", "n_neg")
    } finally { parts.unpersist(); pre.unpersist() }
  }

  /** Binary-classification confusion counts and the derived metrics, in
    * ONE map-side-combined aggregate pass: (tp, fp, fn, tn, precision,
    * recall, f1, accuracy) as a single row. Predictions and labels are
    * truthy longs (0 = negative, anything else = positive); rows with a
    * null on either side are excluded. The three ratios divide exact
    * longs (f1 as 2tp/(2tp+fp+fn) — one division, not a composition of
    * rounded intermediates). */
  def confusionStats(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val p = col(predCol).cast("long") =!= 0L
    val y = col(labelCol).cast("long") =!= 0L
    val one = df.filter(col(predCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        coalesce(sum(when(p && y, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(p && !y, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(!p && y, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(!p && !y, 1L).otherwise(0L)), lit(0L)).as("tn"))
    // ANSI mode makes /0 throw; an absent denominator is a NULL metric
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den =!= 0L, num.cast(DoubleType) / den)
    one.select(col("tp"), col("fp"), col("fn"), col("tn"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(col("tp") * 2L, col("tp") * 2L + col("fp") + col("fn")).as("f1"),
      ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"))
  }
}
