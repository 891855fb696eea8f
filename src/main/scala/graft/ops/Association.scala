package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical-association measures from a contingency census — the
  * feature-selection / redundancy-detection companions to the numeric
  * correlation matrix (a18): does knowing column A tell you anything
  * about column B? Used on label columns before training (leakage
  * detection: a "feature" with V ≈ 1 against the target is the target)
  * and on metadata columns during profiling.
  *
  * Scale shape: everything derives from the (a, b) contingency census —
  * one map-side-combined aggregate over the corpus; the marginals are
  * two more aggregates over the census (cells × 1 rows, never corpus
  * rows). No windows over data, no collects.
  */
object Association {

  /** One-row association report for two categorical columns:
    * (n, n_a, n_b, chi2, cramers_v, mutual_info) — the chi-square
    * statistic, bias-uncorrected Cramér's V = √(χ²/(n·min(r−1,c−1))),
    * and mutual information in nats I = Σ p_ab·ln(p_ab/(p_a·p_b)).
    * V is NULL for a degenerate table (either column constant). */
  def associationStats(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"), col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val withMarg = cells
      .withColumn("__ca", sum("__c").over(Window.partitionBy(col("__a"))))
      .withColumn("__cb", sum("__c").over(Window.partitionBy(col("__b"))))
      .withColumn("__n", sum("__c").over(Window.partitionBy()))
    // expected count per OBSERVED cell; the chi-square contribution of
    // structurally-absent cells (observed 0) is their expected count,
    // so chi2 = sum over observed cells of (o-e)^2/e + (n - sum of
    // observed-cell expectations) — absent cells are never materialized
    val e = col("__ca").cast("double") * col("__cb") / col("__n")
    val nd = col("__n").cast("double")
    withMarg
      .agg(
        min(col("__n")).as("n"),
        countDistinct(col("__a")).as("n_a"),
        countDistinct(col("__b")).as("n_b"),
        sum((col("__c") - e) * (col("__c") - e) / e).as("__chiObs"),
        sum(e).as("__eObs"),
        sum(col("__c").cast("double") / nd *
          log(col("__c").cast("double") * nd /
            (col("__ca").cast("double") * col("__cb")))).as("mutual_info"))
      .select(col("n"), col("n_a"), col("n_b"),
        (col("__chiObs") + (col("n").cast("double") - col("__eObs"))).as("chi2"),
        col("mutual_info"))
      .select(col("n"), col("n_a"), col("n_b"), col("chi2"),
        {
          val dof = least(col("n_a"), col("n_b")) - lit(1)
          when(dof > 0, sqrt(col("chi2") / (col("n").cast("double") * dof)))
            .as("cramers_v")
        },
        col("mutual_info"))
  }
}
