package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over keyed, regularly-sampled series — the
  * shapes that profile event streams before a model ever sees them
  * (is traffic autocorrelated? at what lag does a metric echo?).
  * Companion to the drift family ([[Drift]]) which compares
  * distributions across windows; this module measures structure WITHIN
  * a series.
  */
object TimeSeries {

  /** Sample autocorrelation r_k for k = 1..maxLag per series key, using
    * the standard biased estimator: r_k = Σ(x_t − x̄)(x_{t−k} − x̄) /
    * Σ(x_t − x̄)² with the full-series mean and denominator.
    *
    * Scale shape: one shuffle keyed by the series key serves every
    * window — the partition-only mean/denominator windows and all
    * maxLag lag offsets share the same partitioning, so Catalyst plans
    * a single exchange; the per-lag sums are computed in ONE aggregate
    * over the series (maxLag conditional sums, not maxLag passes) and
    * only the lag-struct explode of the AGGREGATED k-row frame produces
    * the long output. The series itself is never multiplied by maxLag.
    * Contract: one row per (key, time) — pre-aggregate to a regular
    * grid first (e.g. hourly sums); gaps are treated as adjacent
    * samples, not missing ones. Returns (key, lag, n_pairs, acf). */
  /** Classical additive seasonal decomposition x = trend + seasonal +
    * residual per series key: centered moving-average trend (the 2×p MA
    * with half-weight endpoints when `period` is even, the plain
    * centered p-window when odd), per-phase means of the detrended
    * series as the seasonal component (centered so it sums to ~0 over a
    * cycle), remainder as residual. Phase is the 0-based row index mod
    * `period` — the same regular-grid contract as [[acf]].
    *
    * Scale shape: one shuffle keyed by the series key serves the
    * row-number, trend-window, and endpoint-lag computations; the
    * seasonal component is a (key × period)-sized census aggregate
    * joined back on (key, phase). Trend (and residual) are NULL at the
    * half-window edges where the centered MA is undefined. Returns
    * (key, time, x, phase, trend, seasonal, residual). */
  def decompose(df: DataFrame, keyCol: String, timeCol: String,
                valueCol: String, period: Int): DataFrame = {
    require(period >= 2 && period <= 1000,
      s"period must be in [2, 1000], got $period")
    val ordered = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val h = period / 2
    val wFull = ordered.rowsBetween(-h, h)
    val base = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .withColumn("__phase", (row_number().over(ordered) - lit(1)) % lit(period))
      .withColumn("__cnt", count(lit(1)).over(wFull))
    val trended =
      if (period % 2 == 0)
        base.withColumn("trend",
          when(col("__cnt") === period + 1,
            (sum(col("__x")).over(wFull) -
              (lag(col("__x"), h).over(ordered) +
                lead(col("__x"), h).over(ordered)) / lit(2.0)) / lit(period.toDouble)))
      else
        base.withColumn("trend",
          when(col("__cnt") === period, sum(col("__x")).over(wFull) / lit(period.toDouble)))
    val det = trended.withColumn("__d", col("__x") - col("trend"))
    val phaseMeans = det.groupBy(col("__k"), col("__phase"))
      .agg(avg(col("__d")).as("__pm"))
      .withColumn("seasonal",
        col("__pm") - avg(col("__pm")).over(Window.partitionBy(col("__k"))))
      .select(col("__k"), col("__phase"), col("seasonal"))
    det.join(phaseMeans, Seq("__k", "__phase"))
      .select(col("__k").as(keyCol), col("__t").as(timeCol),
        col("__x").as("x"), col("__phase").as("phase"), col("trend"),
        col("seasonal"),
        (col("__x") - col("trend") - col("seasonal")).as("residual"))
  }

  def acf(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1, 64], got $maxLag")
    val byKey = Window.partitionBy(col("__k"))
    val ordered = byKey.orderBy(col("__t"))
    var d = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .withColumn("__m", avg(col("__x")).over(byKey))
    for (k <- 1 to maxLag)
      d = d.withColumn(s"__xl$k", lag(col("__x"), k).over(ordered))
    val dev = col("__x") - col("__m")
    val aggs =
      sum(dev * dev).as("__den") +:
        (1 to maxLag).flatMap { k =>
          val lk = col(s"__xl$k")
          Seq(
            sum(when(lk.isNotNull, dev * (lk - col("__m")))
              .otherwise(lit(0.0))).as(s"__num$k"),
            sum(when(lk.isNotNull, lit(1L)).otherwise(lit(0L))).as(s"__n$k"))
        }
    val rows = (1 to maxLag).map { k =>
      struct(lit(k).as("lag"), col(s"__n$k").as("n_pairs"),
        // constant series have zero variance: acf undefined -> NULL
        // (explicit, so no engine is asked for 0/0)
        when(col("__den") > 0, col(s"__num$k") / col("__den")).as("acf"))
    }
    d.groupBy(col("__k"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__k"), explode(array(rows: _*)).as("__r"))
      .select(col("__k").as(keyCol), col("__r.lag").as("lag"),
        col("__r.n_pairs").as("n_pairs"), col("__r.acf").as("acf"))
  }
}
