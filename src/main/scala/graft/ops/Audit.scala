package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-audit statistics — distribution-shape checks that flag
  * fabricated, truncated, or template-generated numeric columns before
  * they poison a training corpus: Benford first-digit conformance (real
  * transaction/measurement data follows log10(1+1/d); synthetic or
  * capped data does not) and the Gini concentration coefficient (how
  * unequally a quantity is spread — token budgets, spend, dup counts).
  */
object Audit {

  /** Benford first-significant-digit profile of a positive integer
    * column (convert currency to cents etc. upstream — the digit is
    * taken from the DECIMAL STRING, not via log10, whose float
    * round-trip misclassifies exact powers of ten). Returns one row per
    * observed digit: (digit, cnt, obs_freq, exp_freq, dev); dev =
    * obs − exp is signed so the caller can read excess/deficit
    * directly. Non-positive and null values are excluded (they carry
    * no leading digit). */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val digits = df.filter(v.isNotNull && (v > 0))
      .select(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("cnt"))
    // global total via a broadcast 1-row aggregate of the same census
    // (exchange reuse plans the census once), not an unpartitioned
    // window — the v13-measured constant-key-window hazard class
    val nTot = broadcast(digits.agg(sum("cnt").as("__n")))
    digits.crossJoin(nTot)
      .select(col("digit"), col("cnt"),
        (col("cnt").cast("double") / col("__n")).as("obs_freq"),
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double")).as("exp_freq"))
      .withColumn("dev", col("obs_freq") - col("exp_freq"))
  }

  /** Exact per-group Theil inequality indices over a positive value
    * column in ONE map-side-combinable aggregate (no sort, no window):
    * Theil-T = (Σ x·ln x)/Σx − ln μ (top-sensitive) and the mean log
    * deviation L = ln μ − (Σ ln x)/n (bottom-sensitive), both closed
    * forms over the sufficient statistics (n, Σx, Σ x·ln x, Σ ln x).
    * Unlike [[groupedGini]] (which needs the sorted census walk), Theil
    * is fully decomposable — the four sums merge exactly across
    * partitions and across incremental batches, so at 100 TB this is a
    * plain partial-aggregate scan with a |groups|-row shuffle.
    * Zero/negative values are excluded (ln undefined). Returns
    * (group, n, mean, theil_t, theil_l). */
  def groupedTheil(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(col(groupCol).isNotNull && v.isNotNull && (v > 0))
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(v).as("__s"),
        sum(v * log(v)).as("__sxlx"), sum(log(v)).as("__slx"))
      .select(col("__g").as(groupCol), col("n"),
        (col("__s") / col("n")).as("mean"),
        (col("__sxlx") / col("__s") - log(col("__s") / col("n"))).as("theil_t"),
        (log(col("__s") / col("n")) - col("__slx") / col("n")).as("theil_l"))
  }

  /** Exact per-group Gini coefficient G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ) over a
    * non-negative value column, computed WITHOUT a pairwise join: on
    * the sorted distinct-value census, Σ_{i<j} cᵢcⱼ(xⱼ−xᵢ) =
    * Σⱼ cⱼ·(xⱼ·C₍<ⱼ₎ − S₍<ⱼ₎) with cumulative count/sum windows — the
    * [[Quantiles]] census discipline (the window orders distinct
    * values, not rows). G = that sum / (n · Σx). Returns
    * (group, n, mean, gini); gini NULL when the group total is 0. */
  def groupedGini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val census = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        (col(valueCol) >= 0))
      .groupBy(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val before = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("__cb", coalesce(sum("__c").over(before), lit(0L)))
      .withColumn("__sb", coalesce(sum(col("__c").cast("double") * col("__v"))
        .over(before), lit(0.0)))
      .groupBy(col("__g"))
      .agg(sum("__c").as("n"),
        sum(col("__c").cast("double") * col("__v")).as("__s"),
        sum(col("__c").cast("double") *
          (col("__v") * col("__cb") - col("__sb"))).as("__md"))
      .select(col("__g").as(groupCol), col("n"),
        (col("__s") / col("n").cast("double")).as("mean"),
        when(col("__s") > 0,
          col("__md") / (col("n").cast("double") * col("__s"))).as("gini"))
  }
}
