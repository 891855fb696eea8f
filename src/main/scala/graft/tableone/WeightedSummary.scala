package graft.tableone

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survey-weighted descriptive summary — the sampling-weights capability
  * the reference lacks entirely (`tableone_pyspark.py` treats every row
  * as weight 1): epidemiology cohorts built from complex survey designs
  * (NHANES-style) must weight every count, percent, mean, and SD by the
  * design weight or the estimates are biased toward the oversampled
  * strata.
  *
  * Deliberately a SEPARATE operator from [[TableOne.summarize]] (whose
  * unweighted surface is reference-parity and oracle-pinned): the
  * weighted output is tidy/long — one row per (variable, level,
  * stratum) — not the reference's formatted-string grid, because
  * downstream consumers of weighted estimates want numbers, not
  * "n (pct)" strings.
  *
  * Statistics (frequency-weight formulas, the standard finite-sample
  * choice; documented so the oracle replays the same denominators):
  *   - categorical: weighted_n = Σw per level, weighted_pct against the
  *     stratum's total weight
  *   - continuous:  weighted_n = Σw, weighted_mean = Σwx / Σw,
  *     weighted_sd = sqrt( Σw(x−m)² / (Σw − 1) ) — computed from the
  *     decomposable moments (Σw, Σwx, Σwx²) in ONE aggregation pass,
  *     no second centering scan
  *
  * Shape: one hash aggregate per variable class over (stratum, level) /
  * (stratum) keys, unioned — every aggregate map-side combines; nothing
  * is collected to the driver.
  */
object WeightedSummary {

  /** @param df        input rows
    * @param stratify  optional stratification column (null stratum values
    *                  pass through as-is — filter upstream if unwanted)
    * @param catCols   categorical variables
    * @param contCols  continuous (numeric) variables
    * @param weightCol sampling-weight column (non-negative; rows with
    *                  null weight are excluded — an unknown design
    *                  weight cannot be silently treated as 1)
    * @return tidy frame (variable, level, stratum, weighted_n,
    *         weighted_pct, weighted_mean, weighted_sd) — pct only for
    *         categorical rows, mean/sd only for continuous rows */
  def summarize(df: DataFrame, stratify: Option[String],
                catCols: Seq[String], contCols: Seq[String],
                weightCol: String): DataFrame = {
    require(catCols.nonEmpty || contCols.nonEmpty, "nothing to analyze")
    val w = col(weightCol).cast("double")
    val base = df.filter(w.isNotNull)
    val stratum: Column = stratify.map(c => col(c).cast("string"))
      .getOrElse(lit("Overall")).as("stratum")

    // stratum weight totals — the percent denominators (tiny; broadcast)
    val totals = base.groupBy(stratum)
      .agg(sum(w).as("__wtot"))

    val catParts = catCols.map { c =>
      base.groupBy(stratum, col(c).cast("string").as("level"))
        .agg(sum(w).as("weighted_n"))
        .join(broadcast(totals), Seq("stratum"))
        .select(lit(c).as("variable"), col("level"), col("stratum"),
          col("weighted_n"),
          (col("weighted_n") / col("__wtot") * 100.0).as("weighted_pct"),
          lit(null).cast("double").as("weighted_mean"),
          lit(null).cast("double").as("weighted_sd"))
    }

    val contParts = contCols.map { c =>
      val x = col(c).cast("double")
      // moments over non-null x only (the reference's null-exclusion
      // semantics, weighted)
      val sw = col("__sw")
      base.filter(x.isNotNull)
        .groupBy(stratum)
        .agg(sum(w).as("__sw"), sum(w * x).as("__swx"), sum(w * x * x).as("__swx2"))
        .select(lit(c).as("variable"), lit(null).cast("string").as("level"),
          col("stratum"),
          sw.as("weighted_n"),
          lit(null).cast("double").as("weighted_pct"),
          // guards are semantic, not just ANSI-safety: Σw = 0 has no
          // mean, and Σw ≤ 1 has no SAMPLE variance (the unweighted
          // n = 1 case, weighted) — both are null, as in TableOne
          when(sw > 0.0, col("__swx") / sw).as("weighted_mean"),
          when(sw > 1.0, sqrt(greatest(
            (col("__swx2") - col("__swx") * col("__swx") / sw) /
              (sw - lit(1.0)), lit(0.0)))).as("weighted_sd"))
    }

    (catParts ++ contParts).reduce(_ unionByName _)
  }
}
