package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over (duration, event, group) subject frames —
  * Kaplan-Meier product-limit curves and the two-group log-rank test.
  * The clinical companion to the [[graft.tableone]] summaries (time-to-
  * event is the third column family of a Table 1 after categorical and
  * continuous), and the same machinery prices retention/churn curves on
  * behavioral data at corpus scale.
  *
  * Scale shape: subjects reduce to a (group, time) census of event and
  * censor counts in one map-side-combined aggregate; every downstream
  * step (at-risk counts, the product-limit, the log-rank expectation
  * walk) runs on the census, whose cardinality is distinct times ×
  * groups — never on subjects. The per-group cumulative windows order
  * census rows only. The product-limit is computed as
  * exp(running-sum of ln terms) in time order, a sequential walk an
  * external engine replays term-for-term.
  */
object Survival {

  /** Per-(group, time) census with at-risk counts: one aggregate over
    * subjects + two windows over the census. `complete = true` expands
    * the census to the FULL (group × pooled-time) grid first (zero
    * event/censor fill) so every group has an at-risk row at every
    * pooled time — the log-rank walk needs that; the per-group KM curve
    * does not. */
  private def riskCensus(df: DataFrame, groupCol: String, durationCol: String,
                         eventCol: String, complete: Boolean): DataFrame = {
    val ev = col(eventCol).cast("int")
    val census0 = df
      .filter(col(groupCol).isNotNull && col(durationCol).isNotNull &&
        ev.isNotNull)
      .groupBy(col(groupCol).as("g"), col(durationCol).cast("double").as("t"))
      .agg(sum(ev).cast("long").as("d"),
        sum(lit(1) - ev).cast("long").as("c"))
    val census =
      if (!complete) census0
      else census0.select(col("g")).distinct()
        .crossJoin(census0.select(col("t")).distinct())
        .join(census0, Seq("g", "t"), "left")
        .na.fill(0L, Seq("d", "c"))
    val byT = Window.partitionBy(col("g")).orderBy(col("t"))
    val whole = Window.partitionBy(col("g"))
    census
      .withColumn("__ng", sum(col("d") + col("c")).over(whole))
      .withColumn("__cb", coalesce(sum(col("d") + col("c"))
        .over(byT.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("__ng") - col("__cb"))
  }

  /** Kaplan-Meier product-limit estimate per group. Returns one row per
    * (group, distinct time): (group, t, n_risk, n_event, n_censor,
    * survival). S(t) = Π over event times ≤ t of (1 − d/n); the product
    * is exp(cum-sum of ln) with an explicit absorbing-zero flag for the
    * d = n terminal event (so no engine is asked for ln(0)). */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val byT = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskCensus(df, groupCol, durationCol, eventCol, complete = false)
      .withColumn("__ln", when(col("d") > 0 && col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
        .otherwise(lit(0.0)))
      .withColumn("__dead", sum(when(col("d") === col("n_risk"), lit(1))
        .otherwise(lit(0))).over(byT))
      .withColumn("survival", when(col("__dead") > 0, lit(0.0))
        .otherwise(exp(sum(col("__ln")).over(byT))))
      .select(col("g").as(groupCol), col("t"), col("n_risk"),
        col("d").as("n_event"), col("c").as("n_censor"), col("survival"))
  }

  /** Two-group log-rank test. The two group labels are resolved by one
    * aggregate-sized collect and attached as literals (the
    * clampToBounds gate). At each pooled event time: E_lo += d·n_lo/n,
    * V += d·(n_lo/n)·(1 − n_lo/n)·(n − d)/(n − 1); z =
    * (O_lo − E_lo)/√V, chi2 = z². Returns one row: (group_lo,
    * group_hi, o_lo, e_lo, z, chi2). */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    val groups = df.filter(col(groupCol).isNotNull && col(durationCol).isNotNull)
      .select(col(groupCol).cast("string")).distinct()
      .orderBy(groupCol).collect().map(_.getString(0))
    require(groups.length == 2,
      s"logRank needs exactly 2 groups in $groupCol, got ${groups.length}")
    val (gLo, gHi) = (groups(0), groups(1))
    val perTime = riskCensus(df, groupCol, durationCol, eventCol, complete = true)
      .groupBy(col("t"))
      .agg(sum("d").as("__d"),
        sum(when(col("g").cast("string") === lit(gLo), col("d"))
          .otherwise(lit(0L))).as("__d1"),
        sum("n_risk").as("__n"),
        sum(when(col("g").cast("string") === lit(gLo), col("n_risk"))
          .otherwise(lit(0L))).as("__n1"))
      .filter(col("__d") > 0)
    perTime
      .agg(sum("__d1").as("o_lo"),
        sum(col("__d").cast("double") * col("__n1") / col("__n")).as("e_lo"),
        sum(when(col("__n") > 1,
          col("__d").cast("double") * (col("__n1").cast("double") / col("__n")) *
            (lit(1.0) - col("__n1").cast("double") / col("__n")) *
            (col("__n") - col("__d")).cast("double") / (col("__n") - lit(1)).cast("double"))
          .otherwise(lit(0.0))).as("__v"))
      .select(lit(gLo).as("group_lo"), lit(gHi).as("group_hi"),
        col("o_lo"), col("e_lo"),
        when(col("__v") > 0,
          (col("o_lo").cast("double") - col("e_lo")) / sqrt(col("__v"))).as("z"),
        when(col("__v") > 0,
          (col("o_lo").cast("double") - col("e_lo")) *
            (col("o_lo").cast("double") - col("e_lo")) / col("__v")).as("chi2"))
  }
}
