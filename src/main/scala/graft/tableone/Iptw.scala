package graft.tableone

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse-probability-of-treatment weighting — the causal-inference
  * companion to [[Smd]]: reweight a cohort so treated and control arms
  * match on covariates, then CHECK the balance with weighted SMDs (the
  * diagnostic that replaces p-values at corpus scale, same argument as
  * t11). Propensity scores are an input column — bring your own model
  * (a fitted logistic, a calibrated GBM score); fitting is iterative
  * and out of scope, the weighting/diagnostic algebra is not.
  *
  * Scale shape: the marginal treatment rate is one aggregate-sized
  * collect attached as a LITERAL (the clampToBounds gate); weights are
  * a narrow projection; the balance table is one melted
  * map-side-combined aggregate over (covariate × row) with k
  * conditional sums — no self-join, no window over data.
  */
object Iptw {

  /** Append a stabilized, truncated IPTW column `iptw`:
    * p/ps for treated rows, (1−p)/(1−ps) for controls (p = marginal
    * treatment rate), clamped into [clampLo, clampHi] — the standard
    * guard against the unbounded variance of extreme scores. `psCol`
    * must lie strictly in (0, 1); violations yield NULL weights rather
    * than infinities. */
  def stabilizedWeights(df: DataFrame, treatCol: String, psCol: String,
                        clampLo: Double = 0.1,
                        clampHi: Double = 10.0): DataFrame = {
    require(clampLo > 0 && clampLo < clampHi,
      s"need 0 < clampLo < clampHi, got [$clampLo, $clampHi]")
    val t = col(treatCol).cast("int")
    val p = df.agg(avg(t.cast("double"))).head().getDouble(0)
    require(p > 0 && p < 1, s"treatment rate must be in (0,1), got $p")
    val ps = col(psCol).cast("double")
    val raw = when(t === 1, lit(p) / ps).otherwise(lit(1.0 - p) / (lit(1.0) - ps))
    // greatest/least SKIP nulls, so the validity gate must wrap the
    // clamp — inside it, an invalid score would clamp to clampLo
    df.withColumn("iptw", when(ps > 0 && ps < 1,
      least(greatest(raw, lit(clampLo)), lit(clampHi))))
  }

  /** Weighted balance table: for each covariate, weighted means and
    * population-style weighted variances per arm, the weighted SMD, and
    * Kish's effective sample size (Σw)²/Σw² per arm — the honest "how
    * much data do I have left after weighting" number. One melted
    * aggregate. Returns (variable, n_t, n_c, ess_t, ess_c, wmean_t,
    * wmean_c, wsmd) with wsmd NULL when the pooled variance
    * degenerates. */
  def weightedBalance(df: DataFrame, treatCol: String, weightCol: String,
                      covCols: Seq[String]): DataFrame = {
    require(covCols.nonEmpty, "need at least one covariate")
    val t = col(treatCol).cast("int")
    val w = col(weightCol).cast("double")
    val melted = df
      .filter(w.isNotNull && t.isNotNull)
      .select(t.as("__t"), w.as("__w"),
        explode(array(covCols.map(c =>
          struct(lit(c).as("v"), col(c).cast("double").as("x"))): _*)).as("__c"))
      .select(col("__t"), col("__w"), col("__c.v").as("__v"), col("__c.x").as("__x"))
      .filter(col("__x").isNotNull)
    def arm(cond: org.apache.spark.sql.Column, tag: String) = Seq(
      sum(when(cond, lit(1L)).otherwise(lit(0L))).as(s"__n$tag"),
      sum(when(cond, col("__w")).otherwise(lit(0.0))).as(s"__sw$tag"),
      sum(when(cond, col("__w") * col("__w")).otherwise(lit(0.0))).as(s"__sww$tag"),
      sum(when(cond, col("__w") * col("__x")).otherwise(lit(0.0))).as(s"__swx$tag"),
      sum(when(cond, col("__w") * col("__x") * col("__x")).otherwise(lit(0.0))).as(s"__swxx$tag"))
    val aggs = arm(col("__t") === 1, "t") ++ arm(col("__t") === 0, "c")
    val g = melted.groupBy(col("__v").as("variable"))
      .agg(aggs.head, aggs.tail: _*)
    def mean(tag: String) = col(s"__swx$tag") / col(s"__sw$tag")
    def variance(tag: String) =
      col(s"__swxx$tag") / col(s"__sw$tag") - mean(tag) * mean(tag)
    val pooled = (variance("t") + variance("c")) / lit(2.0)
    g.select(col("variable"), col("__nt").as("n_t"), col("__nc").as("n_c"),
      (col("__swt") * col("__swt") / col("__swwt")).as("ess_t"),
      (col("__swc") * col("__swc") / col("__swwc")).as("ess_c"),
      mean("t").as("wmean_t"), mean("c").as("wmean_c"),
      when(pooled > 0, (mean("t") - mean("c")) / sqrt(pooled)).as("wsmd"))
  }
}
