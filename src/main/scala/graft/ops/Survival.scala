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

  /** The ONE aggregate over subjects: per-(group, time) event and
    * censor counts. This is the only step that executes the caller's
    * frame — everything downstream (at-risk windows, product-limit,
    * log-rank walk, even the two-label probe) runs on this census,
    * whose cardinality is distinct times × groups. */
  private def subjectCensus(df: DataFrame, groupCol: String, durationCol: String,
                            eventCol: String): DataFrame = {
    val ev = col(eventCol).cast("int")
    df.filter(col(groupCol).isNotNull && col(durationCol).isNotNull &&
        ev.isNotNull)
      .groupBy(col(groupCol).as("g"), col(durationCol).cast("double").as("t"))
      .agg(sum(ev).cast("long").as("d"),
        sum(lit(1) - ev).cast("long").as("c"))
  }

  /** At-risk counts over a census frame: two windows, census-sized.
    * `complete = true` expands the census to the FULL (group ×
    * pooled-time) grid first (zero event/censor fill) so every group
    * has an at-risk row at every pooled time — the log-rank walk needs
    * that; the per-group KM curve does not. */
  private def atRisk(census0: DataFrame, complete: Boolean): DataFrame = {
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
    atRisk(subjectCensus(df, groupCol, durationCol, eventCol), complete = false)
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

  /** Nelson-Aalen cumulative hazard per group — the hazard-scale
    * companion to [[kaplanMeier]]: H(t) = Σ_{event times ≤ t} d/n.
    * Preferred over −ln S(t) for small risk sets (it has no absorbing
    * zero: a d = n terminal event adds a finite d/n = 1 step), and its
    * increments ARE the discrete hazard — the retention-curve slope
    * readout. Same census discipline as the KM curve: the subjects
    * frame executes once into the (group, time) census; the cumulative
    * sum windows order census rows only. Returns one row per (group,
    * distinct time): (group, t, n_risk, n_event, n_censor,
    * cum_hazard). */
  def nelsonAalen(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val byT = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk(subjectCensus(df, groupCol, durationCol, eventCol), complete = false)
      .withColumn("__h", when(col("d") > 0,
        col("d").cast("double") / col("n_risk").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("cum_hazard", sum(col("__h")).over(byT))
      .select(col("g").as(groupCol), col("t"), col("n_risk"),
        col("d").as("n_event"), col("c").as("n_censor"), col("cum_hazard"))
  }

  /** Two-group log-rank test. At each pooled event time:
    * E_lo += d·n_lo/n, V += d·(n_lo/n)·(1 − n_lo/n)·(n − d)/(n − 1);
    * z = (O_lo − E_lo)/√V, chi2 = z². Returns one row: (group_lo,
    * group_hi, o_lo, e_lo, z, chi2).
    *
    * The caller's subjects frame executes exactly ONCE: its census is
    * persisted (census-sized — distinct times × groups), the two group
    * labels come off the census (an aggregate-sized collect), the
    * complete-grid walk runs over the cached census, and the one-row
    * result is collected inside the persist scope and lifted back as a
    * literal row — the sound-release pattern every call-scoped persist
    * here uses. Before this, the label probe and the census each
    * re-executed the caller's plan (a fact-fact join upstream ran
    * twice: t15 measured 18.7 s vs its 5.9 s sibling at sf10 on the
    * SAME subjects frame). */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    val spark = df.sparkSession
    val c0 = subjectCensus(df, groupCol, durationCol, eventCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // label probe off the CENSUS — this is the execution that fills
      // the cache; groups whose rows all carry null durations/events
      // are (as before) not label candidates
      val groups = c0.select(col("g").cast("string")).distinct()
        .orderBy("g").collect().map(_.getString(0))
      require(groups.length == 2,
        s"logRank needs exactly 2 groups in $groupCol, got ${groups.length}")
      val (gLo, gHi) = (groups(0), groups(1))
      val perTime = atRisk(c0, complete = true)
        .groupBy(col("t"))
        .agg(sum("d").as("__d"),
          sum(when(col("g").cast("string") === lit(gLo), col("d"))
            .otherwise(lit(0L))).as("__d1"),
          sum("n_risk").as("__n"),
          sum(when(col("g").cast("string") === lit(gLo), col("n_risk"))
            .otherwise(lit(0L))).as("__n1"))
        .filter(col("__d") > 0)
      val r = perTime
        .agg(sum("__d1").as("o_lo"),
          sum(col("__d").cast("double") * col("__n1") / col("__n")).as("e_lo"),
          sum(when(col("__n") > 1,
            col("__d").cast("double") * (col("__n1").cast("double") / col("__n")) *
              (lit(1.0) - col("__n1").cast("double") / col("__n")) *
              (col("__n") - col("__d")).cast("double") / (col("__n") - lit(1)).cast("double"))
            .otherwise(lit(0.0))).as("__v"))
        .head()
      val oLo = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val eLo = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val v = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
      // same float op ORDER as the previous in-plan expressions (the
      // oracle replays these exact operations): z = (o−e)/√v and
      // chi2 = (o−e)·(o−e)/v — chi2 is NOT z·z in floating point
      val z = for { o <- oLo; e <- eLo; if v > 0 } yield (o.toDouble - e) / math.sqrt(v)
      val chi2 = for { o <- oLo; e <- eLo; if v > 0 } yield (o.toDouble - e) * (o.toDouble - e) / v
      import spark.implicits._
      Seq((gLo, gHi, oLo, eLo, z, chi2))
        .toDF("group_lo", "group_hi", "o_lo", "e_lo", "z", "chi2")
    } finally { c0.unpersist(); () }
  }
}
