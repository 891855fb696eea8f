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

  /** First-order Markov transition matrix over per-entity event
    * sequences: P(next = b | current = a) estimated from the bigram
    * census of each entity's time-ordered stream — the behavioral-model
    * summary (and anomaly baseline) of an event log. `tieCol` breaks
    * equal timestamps so the sequence — and therefore the census — is
    * deterministic.
    *
    * Scale shape: one shuffle keyed by entity for the lag window, then
    * a map-side-combined (from, to) census; row-normalization is a
    * marginal window over the states×states census, never over events.
    * Returns (from_state, to_state, cnt, prob). */
  def transitionMatrix(df: DataFrame, entityCol: String, timeCol: String,
                       stateCol: String, tieCol: String): DataFrame = {
    val ordered = Window.partitionBy(col("__e"))
      .orderBy(col("__t"), col("__tb"))
    df.filter(col(entityCol).isNotNull && col(timeCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(entityCol).as("__e"), col(timeCol).as("__t"),
        col(tieCol).as("__tb"), col(stateCol).cast("string").as("__s"))
      .withColumn("__prev", lag(col("__s"), 1).over(ordered))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_state"), col("__s").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob", col("cnt").cast("double") /
        sum("cnt").over(Window.partitionBy(col("from_state"))))
  }

  /** Lead-lag cross-correlation between two aligned series per key:
    * r(k) = Σ(x_t − x̄)(y_{t−k} − ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²) for
    * k = −maxLag..maxLag — positive k means x echoes y k steps later
    * (y leads). Same one-shuffle shape and regular-grid contract as
    * [[acf]]; the global means/denominators keep r(0) equal to the
    * plain Pearson correlation. Returns (key, lag, n_pairs, ccf). */
  def crossCorrelation(df: DataFrame, keyCol: String, timeCol: String,
                       xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1, 64], got $maxLag")
    val byKey = Window.partitionBy(col("__k"))
    val ordered = byKey.orderBy(col("__t"))
    var d = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .withColumn("__mx", avg(col("__x")).over(byKey))
      .withColumn("__my", avg(col("__y")).over(byKey))
    for (k <- -maxLag to maxLag; if k != 0)
      d = d.withColumn(s"__yl${lagName(k)}",
        // explicit lead for negative k (not lag with a negative offset,
        // which not every engine honors — the oracle replays lead too)
        if (k < 0) lead(col("__y"), -k).over(ordered)
        else lag(col("__y"), k).over(ordered))
    val dx = col("__x") - col("__mx")
    val aggs =
      Seq(sum(dx * dx).as("__dx2"),
        sum((col("__y") - col("__my")) * (col("__y") - col("__my"))).as("__dy2")) ++
        (-maxLag to maxLag).flatMap { k =>
          val yk = if (k == 0) col("__y") else col(s"__yl${lagName(k)}")
          Seq(
            sum(when(yk.isNotNull, dx * (yk - col("__my")))
              .otherwise(lit(0.0))).as(s"__num${lagName(k)}"),
            sum(when(yk.isNotNull, lit(1L)).otherwise(lit(0L))).as(s"__n${lagName(k)}"))
        }
    val rows = (-maxLag to maxLag).map { k =>
      struct(lit(k).as("lag"), col(s"__n${lagName(k)}").as("n_pairs"),
        when(col("__dx2") > 0 && col("__dy2") > 0,
          col(s"__num${lagName(k)}") / sqrt(col("__dx2") * col("__dy2"))).as("ccf"))
    }
    d.groupBy(col("__k"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__k"), explode(array(rows: _*)).as("__r"))
      .select(col("__k").as(keyCol), col("__r.lag").as("lag"),
        col("__r.n_pairs").as("n_pairs"), col("__r.ccf").as("ccf"))
  }

  /** CUSUM changepoint scan per series key: with S_t = Σ_{i≤t}(xᵢ − x̄),
    * the changepoint estimate is the FIRST index maximizing |S_t| and
    * the reported statistic is max|S_t| / (σ̂√n) — the Brownian-bridge
    * normalization, so values ≳1.36 reject "no change" at ~5%.
    *
    * Determinism: the argmax is taken over the criterion
    * |n·cumsum_t − t·total|, which for integer-valued series (counts)
    * is an EXACT integer in a double — the located index never depends
    * on float-summation order across engines; only the reported
    * magnitudes are floats. Scale shape: one shuffle keyed by the
    * series key serves the row-number, cumulative-sum, and per-key
    * scalar windows; the argmax filter plus a |keys|-row census reduce
    * the series to one row per key. Same regular-grid contract as
    * [[acf]]. Returns (key, n, cp_index, cp_time, s_max, stat);
    * stat NULL for a constant series. */
  def cusum(df: DataFrame, keyCol: String, timeCol: String,
            valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(col("__k"))
    val ordered = byKey.orderBy(col("__t"))
    val cum = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nd = col("__n").cast("double")
    val picked = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__cs", sum("__x").over(cum))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__tot", sum("__x").over(byKey))
      .withColumn("__sd", stddev_pop(col("__x")).over(byKey))
      .withColumn("__crit", abs(nd * col("__cs") - col("__rn") * col("__tot")))
      .withColumn("__mx", max(col("__crit")).over(byKey))
      .filter(col("__crit") === col("__mx"))
    picked
      .groupBy(col("__k"))
      .agg(min(struct(col("__rn").as("rn"), col("__t").as("t"))).as("__pick"),
        min(col("__n")).as("n"), min(col("__mx")).as("__m"),
        min(col("__sd")).as("__s"))
      .select(col("__k").as(keyCol), col("n"),
        col("__pick.rn").as("cp_index"), col("__pick.t").as("cp_time"),
        (col("__m") / col("n")).as("s_max"),
        when(col("__s") > 0,
          col("__m") / (col("n") * col("__s") * sqrt(col("n").cast("double"))))
          .as("stat"))
  }

  /** Grouped OLS trend fit y = slope·x + intercept per series key, with
    * x the 1-based POSITION in time order (not the raw timestamp): the
    * slope reads as "change per step", and — the determinism point —
    * every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    * integer in a double for integer-valued series, so the fit is
    * engine-independent regardless of partial-aggregation order, where
    * raw epoch-seconds x would put Σx² near 2⁵³ and make the
    * n·Σxy − Σx·Σy cancellation float-order-sensitive.
    *
    * Scale shape: one shuffle keyed by the series key serves the
    * row-number window; the six sums ride a map-side-combined aggregate
    * down to |keys| rows where the closed forms run row-locally.
    * Returns (key, n, slope, intercept, r2); slope/intercept NULL for
    * n < 2, r2 NULL when the series is constant (zero y-variance). */
  def trend(df: DataFrame, keyCol: String, timeCol: String,
            valueCol: String): DataFrame = {
    val ordered = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val sums = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(valueCol).cast("double").as("__y"))
      .withColumn("__x", row_number().over(ordered).cast("double"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"), sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val nd = col("n").cast("double")
    val covN = nd * col("__sxy") - col("__sx") * col("__sy")
    val varXN = nd * col("__sxx") - col("__sx") * col("__sx")
    val varYN = nd * col("__syy") - col("__sy") * col("__sy")
    val slope = covN / varXN
    sums.select(col("__k").as(keyCol), col("n"),
      when(col("n") >= 2L, slope).as("slope"),
      when(col("n") >= 2L, (col("__sy") - slope * col("__sx")) / nd).as("intercept"),
      when(col("n") >= 2L && varYN > 0,
        (covN * covN) / (varXN * varYN)).as("r2"))
  }

  /** Seasonal and trend strength per key over a [[decompose]] output
    * (Hyndman & Athanasopoulos FPP3 §4.4):
    * F_seasonal = max(0, 1 − Var(R)/Var(S+R)) and
    * F_trend = max(0, 1 − Var(R)/Var(T+R)) — the one-number answers to
    * "is this series actually seasonal / trending, or is the
    * decomposition fitting noise?", computed only over rows where the
    * centered-MA trend is defined (the decomposition's edge rows carry
    * null trend by construction). Sample variances; strengths NULL
    * when the denominator variance is degenerate.
    *
    * Scale shape: ONE map-side-combinable aggregate over the
    * decomposed frame (six power sums per key), row-local algebra on
    * the ≤|keys| census. Returns (key, n, f_seasonal, f_trend). */
  def seasonalStrength(decomposed: DataFrame, keyCol: String): DataFrame = {
    val r = col("residual")
    val sr = col("seasonal") + col("residual")
    val tr = col("trend") + col("residual")
    val sums = decomposed
      .filter(col("trend").isNotNull && col("residual").isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("n"),
        sum(r).as("__s1"), sum(r * r).as("__s2"),
        sum(sr).as("__s3"), sum(sr * sr).as("__s4"),
        sum(tr).as("__s5"), sum(tr * tr).as("__s6"))
    val nd = col("n").cast("double")
    def v(sx: String, sxx: String) =
      (col(sxx) - col(sx) * col(sx) / nd) / (nd - lit(1.0))
    val vr = v("__s1", "__s2")
    val vs = v("__s3", "__s4")
    val vt = v("__s5", "__s6")
    sums.select(col("__k").as(keyCol), col("n"),
      when(col("n") >= 2 && vs > 0,
        greatest(lit(0.0), lit(1.0) - vr / vs)).as("f_seasonal"),
      when(col("n") >= 2 && vt > 0,
        greatest(lit(0.0), lit(1.0) - vr / vt)).as("f_trend"))
  }

  /** Theil-Sen robust slope per series key — the median of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i), the trend estimator that shrugs
    * off the outlier days OLS [[trend]] gets dragged by (29.3%
    * breakdown point). Duplicate x within a key collapse to their mean
    * y first (same-x pairs have undefined slope; the collapse is the
    * standard treatment and makes the census deterministic).
    *
    * Scale shape: ONE map-side-combined (key, x) census over the
    * corpus, then the pairwise join runs in CENSUS space keyed on the
    * series key — the t23/kendallTau tiny-cross class, quadratic in
    * points-per-key, never in rows. `maxPoints` enforces that contract
    * (a daily census is ~365 points/year → ~66k slope pairs per key);
    * beyond it, pre-bucket the time axis. The median is the exact
    * interpolated percentile over each key's slope set — a shuffle
    * keyed (key), with per-key pair counts bounded by maxPoints²/2.
    * Returns (key, n_points, n_pairs, sen_slope). */
  def theilSen(df: DataFrame, keyCol: String, xCol: String, yCol: String,
               maxPoints: Int = 2048): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val census = df
      .filter(col(keyCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"))
      .agg(avg(col(yCol).cast("double")).as("__y"))
    // null max (fully-filtered input) -> 0 -> empty result, not an NPE
    val maxRow = census.groupBy("__k").agg(count(lit(1)).as("c"))
      .agg(max("c")).head()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    require(maxN <= maxPoints,
      s"theilSen is quadratic in census points per key: got $maxN (> maxPoints " +
        s"$maxPoints) — bucket the x axis first (e.g. daily → weekly)")
    val a = census.select(col("__k"), col("__x").as("__x1"), col("__y").as("__y1"))
    val b = census.select(col("__k"), col("__x").as("__x2"), col("__y").as("__y2"))
    a.join(b, Seq("__k")).filter(col("__x1") < col("__x2"))
      .select(col("__k"),
        ((col("__y2") - col("__y1")) / (col("__x2") - col("__x1"))).as("__slope"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(__slope, 0.5)").as("sen_slope"))
      .join(census.groupBy("__k").agg(count(lit(1)).as("n_points")), Seq("__k"))
      .select(col("__k").as(keyCol), col("n_points"), col("n_pairs"),
        col("sen_slope"))
  }

  /** Mann–Kendall trend test per series key — the distribution-free
    * "is there ANY monotone trend" companion to [[theilSen]]'s slope:
    * S = Σ_{i<j} sgn(y_j − y_i) over the x-ordered points, with the
    * tie-corrected normal approximation
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 (t_g = size
    * of each tied-y group) and the continuity-corrected
    * Z = (S−sgn(S))/√Var(S). Duplicate x within a key collapse to
    * their mean y first (the theilSen treatment — deterministic census,
    * and S is undefined over same-x pairs).
    *
    * Scale shape: the [[theilSen]] contract exactly — ONE map-side-
    * combined (key, x) census, the sign join quadratic in CENSUS points
    * per key (gated by `maxPoints`), the tie census a second tiny
    * aggregate of the same frame; S folds as an exact long sum, so the
    * oracle replays it bit-for-bit and only Var's single /18 and the
    * final Z are doubles. Returns (key, n_points, s_stat, var_s, z);
    * z NULL when Var(S) = 0 (all y tied) or n < 2. */
  def mannKendall(df: DataFrame, keyCol: String, xCol: String, yCol: String,
                  maxPoints: Int = 2048): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val census = df
      .filter(col(keyCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"))
      .agg(avg(col(yCol).cast("double")).as("__y"))
    // a fully-filtered input leaves a null max: treat as 0 so the empty
    // census flows through to an empty result, not an NPE
    val maxRow = census.groupBy("__k").agg(count(lit(1)).as("c"))
      .agg(max("c")).head()
    val maxN = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    require(maxN <= maxPoints,
      s"mannKendall is quadratic in census points per key: got $maxN (> maxPoints " +
        s"$maxPoints) — bucket the x axis first (e.g. daily → weekly)")
    val a = census.select(col("__k"), col("__x").as("__x1"), col("__y").as("__y1"))
    val b = census.select(col("__k"), col("__x").as("__x2"), col("__y").as("__y2"))
    val sStat = a.join(b, Seq("__k")).filter(col("__x1") < col("__x2"))
      .groupBy("__k")
      .agg(sum(signum(col("__y2") - col("__y1")).cast("long")).as("s_stat"))
    // tie-group sizes over y; each group's t(t-1)(2t+5) term is exact
    // long arithmetic (t <= maxPoints, far under the 2^63 bound)
    def kTerm(t: org.apache.spark.sql.Column) = t * (t - 1) * (t * 2 + 5)
    val ties = census.groupBy(col("__k"), col("__y"))
      .agg(count(lit(1)).as("__t"))
      .groupBy("__k")
      .agg(sum("__t").as("n_points"), sum(kTerm(col("__t"))).as("__tieK"))
    val varS = (kTerm(col("n_points")) - col("__tieK")).cast("double") / lit(18.0)
    ties.join(sStat, Seq("__k"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var_s", varS)
      .withColumn("z",
        when(col("n_points") >= 2 && col("var_s") > 0,
          (col("s_stat") - signum(col("s_stat"))).cast("double") /
            sqrt(col("var_s"))))
      .select(col("__k").as(keyCol), col("n_points"), col("s_stat"),
        col("var_s"), col("z"))
  }

  /** Single change-point detection per series key (binary segmentation,
    * depth 1): over the x-ordered census, every split boundary t scores
    * |mean_left − mean_right| · √(n_L·n_R / n) — the two-sample mean
    * shift normalized so noise doesn't favor edge splits — and the
    * maximizer (ties → earliest x) is the change point. Paired with
    * [[cusum]]: CUSUM flags THAT a shift happened online; this names
    * WHERE, offline.
    *
    * Scale shape: the corpus folds to the (key, x) census first; prefix
    * counts/sums are windows over CENSUS rows (regular many-keys
    * shape), the score is row-local off exact integer-free doubles
    * derived from exact sums, and the argmax is one more census
    * window. Returns (key, n_points, split_x, mean_left, mean_right,
    * stat); one row per key with ≥ 2 points. */
  def changePoint(df: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val census = df
      .filter(col(keyCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"))
      // avg, not sum: duplicate x values collapse to their MEAN, the
      // same convention as the sibling census operators (theilSen,
      // mannKendall) — a generic caller feeding raw (key, x, y) rows
      // gets mean-shift scores over the series values, never summed
      // duplicates
      .agg(avg(col(yCol).cast("double")).as("__y"))
    val wOrd = Window.partitionBy("__k").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("__k")
    val scored = census
      .withColumn("__nl", count(lit(1)).over(wOrd))
      .withColumn("__sl", sum("__y").over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum("__y").over(wAll))
      .filter(col("__nl") < col("__n")) // a boundary needs a non-empty right side
      .withColumn("__ml", col("__sl") / col("__nl").cast("double"))
      .withColumn("__mr",
        (col("__s") - col("__sl")) / (col("__n") - col("__nl")).cast("double"))
      .withColumn("__stat",
        abs(col("__ml") - col("__mr")) *
          sqrt(col("__nl").cast("double") * (col("__n") - col("__nl")).cast("double") /
            col("__n").cast("double")))
    val wBest = Window.partitionBy("__k").orderBy(col("__stat").desc, col("__x"))
    scored.withColumn("__r", row_number().over(wBest))
      .filter(col("__r") === 1)
      .select(col("__k").as(keyCol), col("__n").as("n_points"),
        col("__x").as("split_x"), col("__ml").as("mean_left"),
        col("__mr").as("mean_right"), col("__stat").as("stat"))
  }

  /** Inter-arrival gap census per series key over per-entity event
    * streams: gaps are taken WITHIN each (key, entity) stream — the
    * window partitions on (key, entity), which stays wide-parallel
    * where a per-key global order would serialize into |keys| sort
    * tasks (the few-fat-groups lesson). Timestamps compare at exact
    * microsecond longs (millisecond truncation loses boundary ties);
    * ties within a stream are pinned by `tieCol`. The mean divides two
    * exact integers before the single 1e6 rescale. Returns
    * (key, n_pairs, mean_gap_s, min_gap_s, max_gap_s). */
  def interArrival(df: DataFrame, keyCol: String, entityCol: String,
                   timeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k"), col("__e"))
      .orderBy(col("__us"), col("__tie"))
    df.filter(col(keyCol).isNotNull && col(entityCol).isNotNull &&
        col(timeCol).isNotNull && col(tieCol).isNotNull)
      .select(col(keyCol).as("__k"), col(entityCol).as("__e"),
        unix_micros(col(timeCol)).as("__us"), col(tieCol).as("__tie"))
      .withColumn("__gap", col("__us") - lag("__us", 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum("__gap").cast("double") / count(lit(1)) / lit(1e6)).as("mean_gap_s"),
        (min("__gap").cast("double") / lit(1e6)).as("min_gap_s"),
        (max("__gap").cast("double") / lit(1e6)).as("max_gap_s"))
      .select(col("__k").as(keyCol), col("n_pairs"),
        col("mean_gap_s"), col("min_gap_s"), col("max_gap_s"))
  }

  private def lagName(k: Int): String = if (k < 0) s"m${-k}" else s"p$k"

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

  /** Western Electric control-chart rules per series key — the SPC
    * screen that catches a drifting pipeline metric BEFORE it crosses
    * any single-point threshold: per point z = (x − μ)/σ against the
    * series' own center line, then
    *   R1: |z| > 3 (a single extreme point),
    *   R2: ≥2 of the last 3 points beyond 2σ on the same side,
    *   R3: ≥4 of the last 5 beyond 1σ on the same side,
    *   R4: 8 consecutive points strictly on one side of the center.
    * A point is flagged for the rule its trailing window completes.
    *
    * `valueCol` must be INTEGRAL (counts — the e11 discipline): μ and
    * σ² fold from exact-long power sums, so both the z values and the
    * rule cuts derive identically in any engine and the flags cannot
    * flake on a float knife edge. A zero-variance series has no z and
    * trips only R4 (which compares against μ, not σ).
    *
    * Scale shape: ONE per-key moment census (map-side-combined exact
    * sums, decimal products) joined back census-sized, then a single
    * per-key ordered window pass evaluating all four rules as rolling
    * indicator sums (frames of ≤8 rows; the partition is the series
    * key, so no unpartitioned window at any scale). Returns one row
    * per key: (key, n_points, mean, std, r1_n..r4_n, first_alarm_ts).
    */
  def westernElectric(df: DataFrame, keyCol: String, timeCol: String,
                      valueCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // Enforce the doc's contract instead of silently casting: a double
    // series truncated toward zero by cast("long") would yield
    // plausible-looking but wrong means and z-cuts. The cast below is
    // then widening-only.
    val vt = df.select(col(valueCol)).schema.head.dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)(vt),
      s"westernElectric valueCol '$valueCol' must be an integral type " +
        s"(the e11 discipline), got $vt — pre-bin or round explicitly first")
    val base = df.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        col(valueCol).cast("long").as("__x"))
      .filter(col("__k").isNotNull && col("__t").isNotNull && col("__x").isNotNull)
    val moments = base.groupBy("__k")
      .agg(count(lit(1)).as("n_points"),
        sum(col("__x")).as("__sx"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"))
      .withColumn("__mu", col("__sx").cast("double") / col("n_points").cast("double"))
      .withColumn("__var",
        when(col("n_points") >= 2,
          (col("__sxx").cast("double") -
            col("__sx").cast("double") * col("__sx").cast("double") /
              col("n_points").cast("double")) /
            (col("n_points").cast("double") - 1.0)))
      .withColumn("__sd", when(col("__var") > 0, sqrt(col("__var"))))
    val w = base.join(moments, Seq("__k"))
    val z = when(col("__sd").isNotNull,
      (col("__x").cast("double") - col("__mu")) / col("__sd"))
    def roll(len: Int) = Window.partitionBy("__k").orderBy(col("__t"))
      .rowsBetween(-(len - 1), Window.currentRow)
    def cnt(c: org.apache.spark.sql.Column, len: Int) =
      sum(when(c, 1).otherwise(0)).over(roll(len))
    val flagged = w.withColumn("__z", z)
      .withColumn("__r1", abs(col("__z")) > 3.0)
      .withColumn("__r2",
        cnt(col("__z") > 2.0, 3) >= 2 || cnt(col("__z") < -2.0, 3) >= 2)
      .withColumn("__r3",
        cnt(col("__z") > 1.0, 5) >= 4 || cnt(col("__z") < -1.0, 5) >= 4)
      .withColumn("__r4",
        cnt(col("__x").cast("double") > col("__mu"), 8) === 8 ||
          cnt(col("__x").cast("double") < col("__mu"), 8) === 8)
    def nTrue(c: String) = coalesce(
      sum(when(col(c), 1L).otherwise(0L)), lit(0L)).as(s"${c.stripPrefix("__")}_n")
    flagged.groupBy(col("__k"), col("n_points"), col("__mu"), col("__sd"))
      .agg(nTrue("__r1"), nTrue("__r2"), nTrue("__r3"), nTrue("__r4"),
        min(when(col("__r1") || col("__r2") || col("__r3") || col("__r4"),
          col("__t"))).as("first_alarm_ts"))
      .select(col("__k").as(keyCol), col("n_points"),
        col("__mu").as("mean"), col("__sd").as("std"),
        col("r1_n"), col("r2_n"), col("r3_n"), col("r4_n"),
        col("first_alarm_ts"))
  }
}
