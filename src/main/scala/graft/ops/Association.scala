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
      // grand total via a broadcast 1-row aggregate of the same cells
      // census (exchange reuse plans it once), not an unpartitioned
      // window; the marginal windows above stay keyed
      .crossJoin(broadcast(cells.agg(sum("__c").as("__n"))))
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

  /** Per-group two-proportion z-test against the complement (each group
    * vs the rest of the population): z = (p₁−p₂) / √(p̂(1−p̂)(1/n₁+1/n₂))
    * with the pooled p̂ — the A/B screen for "does this slice convert
    * differently?". successCol must be 0/1 (or castable to it).
    *
    * Scale shape: ONE map-side-combinable census aggregate over the
    * corpus; the group-vs-rest arithmetic is a total window over the
    * ≤|groups| census rows, never over data. Returns
    * (group, n, successes, p_group, p_rest, z); z NULL when the
    * complement is empty or p̂ is degenerate (0 or 1). */
  def twoProportionZ(df: DataFrame, groupCol: String,
                     successCol: String): DataFrame = {
    val census = df
      .filter(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(col(successCol).cast("long")).as("successes"))
    val n1 = col("n").cast("double")
    val n2 = (col("__N") - col("n")).cast("double")
    val p1 = col("successes").cast("double") / n1
    val p2 = (col("__X") - col("successes")).cast("double") / n2
    val phat = col("__X").cast("double") / col("__N")
    // totals via a broadcast 1-row aggregate of the same census
    // (exchange reuse plans the census once), not an unpartitioned
    // window — the v13-measured constant-key-window hazard class
    census
      .crossJoin(broadcast(census.agg(
        sum("n").as("__N"), sum("successes").as("__X"))))
      .select(col("__g").as(groupCol), col("n"), col("successes"),
        p1.as("p_group"),
        when(col("__N") > col("n"), p2).as("p_rest"),
        when(col("__N") > col("n") && phat > 0 && phat < 1,
          (p1 - p2) / sqrt(phat * (lit(1.0) - phat) *
            (lit(1.0) / n1 + lit(1.0) / n2))).as("z"))
  }

  /** Wilson score interval per group for a 0/1 outcome — the proportion
    * CI that stays inside [0, 1] and behaves at p̂ near 0/1 where the
    * naive Wald interval collapses: with z the normal quantile,
    * center = (p̂ + z²/2n) / (1 + z²/n) and
    * half-width = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n).
    *
    * Scale shape: ONE map-side-combinable (n, successes) census per
    * group; the interval arithmetic is row-local over |groups| rows.
    * Returns (group, n, successes, p_hat, ci_lo, ci_hi). */
  def wilsonInterval(df: DataFrame, groupCol: String, successCol: String,
                     z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val census = df
      .filter(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(col(successCol).cast("long")).as("successes"))
    val nd = col("n").cast("double")
    val ph = col("successes").cast("double") / nd
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nd
    val center = (ph + z2 / (lit(2.0) * nd)) / denom
    val half = lit(z) * sqrt(ph * (lit(1.0) - ph) / nd +
      z2 / (lit(4.0) * nd * nd)) / denom
    census.select(col("__g").as(groupCol), col("n"), col("successes"),
      ph.as("p_hat"), (center - half).as("ci_lo"), (center + half).as("ci_hi"))
  }

  /** Cochran–Armitage trend test: is a 0/1 outcome rate MONOTONE in an
    * ordered exposure? With integer scores w per ordered group,
    * T = Σ wᵢ(xᵢ − nᵢp̄) and Var(T) = p̄(1−p̄)(Σ nᵢwᵢ² − (Σ nᵢwᵢ)²/N);
    * z = T/√Var — the dose-response screen the per-group t17 z cannot
    * give (k separate tests say nothing about ordering).
    *
    * scoreCol must be a NUMERIC group score (the ordering). Scale
    * shape: ONE map-side-combinable (score → n, x) census, a second
    * aggregate over the ≤|groups| census rows; every sum is an exact
    * long until p̄'s division. Returns ONE row
    * (n_groups, n, successes, t_stat, z); z NULL when p̄ is degenerate
    * or the scores are constant. */
  def cochranArmitage(df: DataFrame, scoreCol: String,
                      successCol: String): DataFrame = {
    val census = df
      .filter(col(scoreCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("__w"))
      .agg(count(lit(1)).as("__n"), sum(col(successCol).cast("long")).as("__x"))
    val sums = census.agg(
      count(lit(1)).as("n_groups"), sum("__n").as("n"), sum("__x").as("successes"),
      sum(col("__n") * col("__w")).as("__snw"),
      sum(col("__n") * col("__w") * col("__w")).as("__snw2"),
      sum(col("__w") * col("__x")).as("__swx"))
    val pbar = col("successes").cast("double") / col("n")
    val t = col("__swx") - pbar * col("__snw")
    val varT = pbar * (lit(1.0) - pbar) *
      (col("__snw2") - col("__snw").cast("double") * col("__snw") / col("n"))
    sums.select(col("n_groups"), col("n"), col("successes"),
      t.as("t_stat"), when(varT > 0, t / sqrt(varT)).as("z"))
  }

  /** Levene's test (mean centers) for variance homogeneity across
    * groups — the assumption check behind every pooled-variance test:
    * with z = |x − x̄_group|, W = ((N−k)/(k−1)) · SSB(z) / SSW(z), an
    * F(k−1, N−k) statistic that is large when spreads differ.
    *
    * Determinism: for integer-valued x the group means are exact
    * integer ratios (identical doubles in any engine), so every z is
    * bit-identical; the remaining sums are bounded floats that 6-dp
    * rounding absorbs. Scale shape: TWO map-side-combinable passes
    * (means; then z power sums with the k-row mean frame broadcast) —
    * SSB/SSW come from the closed forms Σ(Σz)²/n − (ΣΣz)²/N and
    * Σz² − Σ(Σz)²/n, all on the ≤k census. Returns ONE row
    * (n_groups, n, ssb, ssw, w); w NULL when k < 2 or SSW = 0. */
  def leveneTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val clean = df.filter(col(groupCol).isNotNull && x.isNotNull)
      .select(col(groupCol).as("__g"), x.as("__x"))
    val means = clean.groupBy("__g")
      .agg((sum("__x") / count(lit(1))).as("__m"))
    val zsums = clean.join(broadcast(means), Seq("__g"))
      .select(col("__g"), abs(col("__x") - col("__m")).as("__z"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__n"), sum("__z").as("__sz"),
        sum(col("__z") * col("__z")).as("__szz"))
    val tot = zsums.agg(
      count(lit(1)).as("n_groups"), sum("__n").as("n"),
      sum(col("__sz") * col("__sz") / col("__n")).as("__sbn"),
      sum("__sz").as("__szt"), sum("__szz").as("__szzt"))
    val k = col("n_groups").cast("double")
    val nd = col("n").cast("double")
    val ssb = col("__sbn") - col("__szt") * col("__szt") / nd
    val ssw = col("__szzt") - col("__sbn")
    tot.select(col("n_groups"), col("n"), ssb.as("ssb"), ssw.as("ssw"),
      when(col("n_groups") >= 2 && ssw > 0,
        ((nd - k) / (k - lit(1.0))) * (ssb / ssw)).as("w"))
  }

  /** McNemar's test for PAIRED binary outcomes (two screens over the
    * same rows — did flag A and flag B disagree more in one direction
    * than the other?): with b = |A ∧ ¬B| and c = |¬A ∧ B|, the
    * continuity-corrected χ² = (|b−c|−1)²/(b+c). The marginal
    * homogeneity check an unpaired two-proportion z gets wrong on
    * paired data (it ignores that concordant pairs carry no signal).
    *
    * Scale shape: ONE map-side-combinable aggregate — four exact long
    * counts, row-local algebra after. Returns ONE row
    * (n, n_agree, b, c, chi2); chi2 NULL when b + c = 0. */
  def mcnemar(df: DataFrame, pred1Col: String, pred2Col: String): DataFrame = {
    val a = col(pred1Col).cast("long") =!= 0L
    val b = col(pred2Col).cast("long") =!= 0L
    val counts = df
      .filter(col(pred1Col).isNotNull && col(pred2Col).isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(a === b, 1L).otherwise(0L)), lit(0L)).as("n_agree"),
        coalesce(sum(when(a && !b, 1L).otherwise(0L)), lit(0L)).as("b"),
        coalesce(sum(when(!a && b, 1L).otherwise(0L)), lit(0L)).as("c"))
    val d = abs(col("b") - col("c")).cast("double") - lit(1.0)
    counts.select(col("n"), col("n_agree"), col("b"), col("c"),
      when(col("b") + col("c") > 0L,
        d * d / (col("b") + col("c"))).as("chi2"))
  }

  /** Cochran's Q test over k ≥ 2 matched binary measurements per
    * subject (k wide 0/1 columns) — [[mcnemar]]'s k-treatment
    * generalization: do the treatments share one success rate?
    * Q = (k−1)(k·ΣC_j² − T²) / (k·T − ΣR_i²) with C_j the treatment
    * totals, R_i the per-subject row totals, T the grand total;
    * Q ~ χ²(k−1) under H₀. At k = 2, Q equals McNemar's uncorrected
    * statistic.
    *
    * Scale shape: ONE map-side-combined aggregate — R_i and R_i² are
    * row-local expressions, so the whole corpus folds to k+3 exact
    * longs and Q is a single double division an external engine
    * replays bit-for-bit. Returns one row
    * (n, k, t_total, q_stat, dof); q NULL when the denominator is 0
    * (every subject constant across treatments). */
  def cochranQ(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"cochranQ needs >= 2 treatment columns, got ${cols.size}")
    val bs = cols.map(c => when(col(c).cast("long") =!= 0L, 1L).otherwise(0L))
    val ri = bs.reduce(_ + _)
    val k = cols.size.toLong
    val aggCols = sum(ri).as("__t") +: sum(ri * ri).as("__r2") +:
      bs.zipWithIndex.map { case (b, i) => sum(b).as(s"__c$i") }
    val sums = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(count(lit(1)).as("n"), aggCols: _*)
    val sumC2 = cols.indices.map(i => col(s"__c$i") * col(s"__c$i")).reduce(_ + _)
    val den = lit(k) * col("__t") - col("__r2")
    sums.select(col("n"), lit(k).as("k"), col("__t").as("t_total"),
      when(den > 0,
        (lit(k - 1) * (lit(k) * sumC2 - col("__t") * col("__t"))).cast("double") /
          den.cast("double")).as("q_stat"),
      lit(k - 1).as("dof"))
  }

  /** Spearman rank correlation for every pair of `cols` — the monotone-
    * association companion to the Pearson matrix (a18): Pearson on
    * TIE-AVERAGED ranks, the textbook tie-corrected rho. Listwise
    * complete-case like a18 so all pairs share one n.
    *
    * Scale shape: ranks come from COUNTS, never a sort of the data —
    * the melted (feature, value) census runs through
    * [[Quantiles.valueCumBefore]] (bucket-offset prefix sums; windows
    * keyed (feature) over bucket censuses and (feature, bucket), never
    * one task per feature), and the tie-averaged rank is the closed
    * form (2·below + cnt + 1)/2 — census algebra, no per-row window at
    * all. The census is PERSISTED and executed once (the t15 logRank
    * lesson — the unpersisted version recomputed the whole census
    * pipeline k times, once per rank-attach join), its per-feature NDV
    * read off the cache, and each column's rank frame then attaches by
    * value as an EXPLICIT broadcast-hash join when its census fits
    * (`maxBroadcastCells`, default 4M value rows ≈ tens of MB) — the k
    * probes chain inside one codegen stage over a single scan of the
    * complete-case frame, no fact-side shuffle at all (sf10: 41 s as
    * k sort-merge joins → one-scan). A census wider than the gate
    * falls back to a shuffled join for that column only. DOUBLED ranks
    * keep everything integral: the final aggregate folds the pairwise
    * sums as DECIMAL(38,0) — exact at any scale, and exactly what an
    * external engine's HUGEINT sums reproduce (the a26 oracle replays
    * rho bit-for-bit; doubling cancels in the formula by powers of
    * two). The sums row is collected (ONE aggregate row — the D1
    * aggregates-only contract) and the per-pair result is literal-
    * lifted, computing rho = (n·Sxy − Sx·Sy) /
    * (√(n·Sxx − Sx²)·√(n·Syy − Sy²)) driver-side in the identical
    * double-op order. Returns (col_x, col_y, n, rho) per pair; rho
    * NULL for a constant column. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String],
                     maxBroadcastCells: Long = 4000000L): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    val complete = cols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
    val melted = complete.select(
      explode(array(cols.map(c =>
        struct(lit(c).as("f"), col(c).as("x"))): _*)).as("__m"))
      .select(col("__m.f").as("__f"), col("__m.x").as("__x"))
    // (feature, value) -> doubled tie-averaged rank, census-sized
    val twoRanks = Quantiles.valueCumBefore(melted)
      .select(col("__f"), col("__x"), col("__c"),
        (col("__before") * 2 + col("__c") + 1).as("__r2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one census-sized pass yields BOTH the per-feature NDV (the
      // broadcast gate) and the exact row count n = Σ cell counts (the
      // long-vs-decimal multiply gate below)
      val censusStats = twoRanks.groupBy("__f")
        .agg(count(lit(1)).as("__cnt"), sum("__c").as("__rows"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val ndv = censusStats.map { case (f, (cnt, _)) => f -> cnt }
      val nExact = censusStats.values.headOption.map(_._2).getOrElse(0L)
      // attach each column's doubled rank by value: k cached-census
      // probes, broadcast when the census fits
      val ranked = cols.foldLeft(complete) { (d, c) =>
        val r = twoRanks.filter(col("__f") === c)
          .select(col("__x").as(c), col("__r2").as(s"__r2_$c"))
        d.join(if (ndv.getOrElse(c, Long.MaxValue) <= maxBroadcastCells)
          broadcast(r) else r, Seq(c))
      }
      val pairs = cols.combinations(2).map { case Seq(cx, cy) => (cx, cy) }.toSeq
      val dec = "decimal(38,0)"
      val rx = (c: String) => col(s"__r2_$c")
      // doubled ranks reach 2n, so a long×long rank product is exact
      // only while (2n+1)² fits a long — n < ~1.5e9. The gate is the
      // EXACT n just read off the census (never an estimate): below it,
      // multiply in long and pay decimal only at the sum (the hot 60M-
      // row loop keeps primitive multiplies); at or past it, cast each
      // factor to decimal first — bit-identical results either way,
      // never a silent wrap (the round-12 advisory).
      val longMulSafe = nExact < 1500000000L
      def prod(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        if (longMulSafe) (a * b).cast(dec) else a.cast(dec) * b.cast(dec)
      val aggs =
        Seq(count(lit(1)).as("__n")) ++
        cols.flatMap(c => Seq(
          sum(rx(c).cast(dec)).as(s"__s_$c"),
          sum(prod(rx(c), rx(c))).as(s"__ss_$c"))) ++
        pairs.map { case (cx, cy) =>
          sum(prod(rx(cx), rx(cy))).as(s"__sp_${cx}_$cy") }
      // the ONE aggregate row, read while the census cache is live
      val row = ranked.agg(aggs.head, aggs.tail: _*).collect().head
      val nRows = row.getLong(row.fieldIndex("__n"))
      def d(name: String): Option[Double] =
        Option(row.getDecimal(row.fieldIndex(name))).map(_.doubleValue)
      val out = pairs.map { case (cx, cy) =>
        val rho = for {
          sx <- d(s"__s_$cx"); sy <- d(s"__s_$cy")
          sxx <- d(s"__ss_$cx"); syy <- d(s"__ss_$cy")
          sxy <- d(s"__sp_${cx}_$cy")
          n = nRows.toDouble
          den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
          if den > 0
        } yield (n * sxy - sx * sy) / den
        (cx, cy, nRows, rho)
      }
      import spark.implicits._
      out.toDF("col_x", "col_y", "n", "rho")
    } finally { twoRanks.unpersist(); () }
  }

  /** Kendall's tau-b for two DISCRETE/ordinal columns from the (x, y)
    * cell census — the concordance companion to [[spearmanMatrix]]
    * when the data is ordinal by nature (priorities, ratings, bucketed
    * scores): C and D count concordant/discordant PAIRS as
    * Σ c₁·c₂ over census-cell pairs with x₁<x₂ (y agreeing/opposing),
    * tie corrections from the marginals, tau-b =
    * (C − D)/√((n₀−n₁)(n₀−n₂)).
    *
    * Scale contract (the d18 NDV lesson): pair counting is quadratic
    * in CELLS, so this operator is for bounded-cardinality ordinals —
    * the census size is checked against `maxCells` (one aggregate-
    * sized count) and the cell-pair join is a documented tiny-cross
    * (census × census, the g8/d22 class); rows themselves are touched
    * exactly once by the census aggregate. Continuous near-unique
    * columns belong in [[spearmanMatrix]], which is linear. All counts
    * fold as DECIMAL(38,0), so the t23 oracle's HUGEINT sums replay
    * tau bit-for-bit; n₀ = n(n−1)/2 and the tie pairs t(t−1)/2 are
    * computed EXACTLY in decimal (halve the even factor with a bit
    * shift, then a decimal multiply — never long×long, never double
    * division), so the counting never wraps or rounds at any row
    * count; only tau_b's final √ denominator is double.
    * Returns one row:
    * (n, n_cells, concordant, discordant, tau_b); tau_b NULL when
    * either margin is constant. */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 maxCells: Int = 4096): DataFrame = {
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .agg(count(lit(1)).as("__c"))
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"kendallTau is quadratic in census cells: got $nCells (> maxCells $maxCells) " +
        "— bucket the columns first, or use spearmanMatrix for continuous data")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // exact k·(k−1)/2 over long counts: halve the EVEN factor first
    // (one of k, k−1 always is) with a bit shift, then multiply in
    // DECIMAL — no double division (loses exactness past 2^53) and no
    // long×long wrap, matching the oracle's integer `//` bit-for-bit
    def choose2(k: org.apache.spark.sql.Column) =
      when(pmod(k, lit(2L)) === 0, dec(shiftright(k, 1)) * dec(k - 1))
        .otherwise(dec(k) * dec(shiftright(k - 1, 1)))
    val a = cells.select(col("__x").as("__x1"), col("__y").as("__y1"), col("__c").as("__c1"))
    val b = cells.select(col("__x").as("__x2"), col("__y").as("__y2"), col("__c").as("__c2"))
    val cd = a.join(b, col("__x1") < col("__x2"))
      .agg(
        coalesce(sum(when(col("__y1") < col("__y2"), dec(col("__c1") * col("__c2")))), dec(lit(0))).as("__C"),
        coalesce(sum(when(col("__y1") > col("__y2"), dec(col("__c1") * col("__c2")))), dec(lit(0))).as("__D"))
    def tiePairs(k: String) = cells.groupBy(col(k)).agg(sum("__c").as("__t"))
      .agg(coalesce(sum(choose2(col("__t"))), dec(lit(0))).as(s"__tie"))
    val nf = cells.agg(sum("__c").as("__n"), count(lit(1)).as("__cells"))
    val n0 = choose2(col("__n")).cast("double")
    val den = sqrt((n0 - col("__t1").cast("double")) * (n0 - col("__t2").cast("double")))
    nf.crossJoin(broadcast(cd))
      .crossJoin(broadcast(tiePairs("__x").select(col("__tie").as("__t1"))))
      .crossJoin(broadcast(tiePairs("__y").select(col("__tie").as("__t2"))))
      .select(col("__n").as("n"), col("__cells").as("n_cells"),
        col("__C").cast("long").as("concordant"),
        col("__D").cast("long").as("discordant"),
        when(den > 0,
          (col("__C") - col("__D")).cast("double") / den).as("tau_b"))
  }

  /** Mantel-Haenszel common odds ratio + CMH statistic for a stratified
    * 2×2 design — "does exposure associate with outcome after adjusting
    * for the stratum?", the confounder-adjusted companion to the crude
    * 2×2 in [[riskRatios]] and the chi-square in the tableone layer.
    * exposureCol/outcomeCol must be 0/1 (or castable); per stratum k
    * with cells (a=e∩o, b=e∩!o, c=!e∩o, d complements, n_k total):
    * OR_MH = Σ(a_k·d_k/n_k) / Σ(b_k·c_k/n_k) and the (uncorrected)
    * CMH statistic (Σa_k − ΣE_k)² / ΣV_k with E_k = r1_k·c1_k/n_k and
    * V_k = r1_k·r0_k·c1_k·c0_k / (n_k²·(n_k−1)).
    *
    * Scale shape: ONE map-side-combinable census over the corpus
    * (stratum × 4 long cells), then row-local arithmetic over
    * |strata| census rows folded by a second tiny aggregate — no
    * windows, no collects. Strata with n_k < 2 contribute nothing to
    * the variance sum (their V_k is undefined) and are excluded from
    * every MH sum, the standard treatment. Returns one row:
    * (n_strata, n, sum_a, or_mh, cmh_stat); or_mh NULL when the
    * discordant denominator is 0, cmh_stat NULL when ΣV_k = 0. */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
                     exposureCol: String, outcomeCol: String): DataFrame = {
    val e = col(exposureCol).cast("int")
    val o = col(outcomeCol).cast("int")
    val census = df
      .filter(col(stratumCol).isNotNull && e.isNotNull && o.isNotNull)
      .groupBy(col(stratumCol).as("__s"))
      .agg(
        sum(e * o).cast("long").as("__a"),
        sum(e * (lit(1) - o)).cast("long").as("__b"),
        sum((lit(1) - e) * o).cast("long").as("__c"),
        sum((lit(1) - e) * (lit(1) - o)).cast("long").as("__d"))
      .withColumn("__nk", col("__a") + col("__b") + col("__c") + col("__d"))
      .filter(col("__nk") >= 2)
    val nk = col("__nk").cast("double")
    val r1 = (col("__a") + col("__b")).cast("double")
    val r0 = (col("__c") + col("__d")).cast("double")
    val c1 = (col("__a") + col("__c")).cast("double")
    val c0 = (col("__b") + col("__d")).cast("double")
    census
      .agg(
        count(lit(1)).as("n_strata"),
        sum(col("__nk")).cast("long").as("n"),
        sum(col("__a")).cast("long").as("sum_a"),
        sum(col("__a").cast("double") * col("__d") / nk).as("__rn"),
        sum(col("__b").cast("double") * col("__c") / nk).as("__rd"),
        sum(r1 * c1 / nk).as("__esum"),
        sum(r1 * r0 * c1 * c0 / (nk * nk * (nk - lit(1.0)))).as("__vsum"))
      .select(col("n_strata"), col("n"), col("sum_a"),
        when(col("__rd") > 0, col("__rn") / col("__rd")).as("or_mh"),
        when(col("__vsum") > 0,
          (col("sum_a").cast("double") - col("__esum")) *
            (col("sum_a").cast("double") - col("__esum")) / col("__vsum"))
          .as("cmh_stat"))
  }

  /** Crude 2×2 effect sizes with 95% CIs — the epidemiology /
    * experiment-readout trio: odds ratio, risk ratio, and risk
    * difference, each with its standard large-sample interval
    * (log-normal Wald for OR and RR, Wald for RD). exposureCol and
    * outcomeCol must be 0/1 (or castable). With cells a=e∩o, b=e∩!o,
    * c=!e∩o, d=!e∩!o:
    * OR = ad/bc, CI exp(ln OR ± z√(1/a+1/b+1/c+1/d));
    * RR = p1/p0, CI exp(ln RR ± z√(b/(a(a+b)) + d/(c(c+d))));
    * RD = p1−p0, CI RD ± z√(p1(1−p1)/(a+b) + p0(1−p0)/(c+d)).
    *
    * Scale shape: ONE map-side-combinable 4-long-cell census aggregate
    * over the corpus, then row-local arithmetic on the single census
    * row. OR/RR and their CIs are NULL when any required cell is 0
    * (the textbook undefined cases); RD needs both margins non-empty. */
  def riskRatios(df: DataFrame, exposureCol: String, outcomeCol: String,
                 z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val e = col(exposureCol).cast("int")
    val o = col(outcomeCol).cast("int")
    val cells = df
      .filter(e.isNotNull && o.isNotNull)
      .agg(
        sum(e * o).cast("long").as("a"),
        sum(e * (lit(1) - o)).cast("long").as("b"),
        sum((lit(1) - e) * o).cast("long").as("c"),
        sum((lit(1) - e) * (lit(1) - o)).cast("long").as("d"))
    val ad = col("a").cast("double")
    val bd = col("b").cast("double")
    val cd = col("c").cast("double")
    val dd = col("d").cast("double")
    val n1 = ad + bd
    val n0 = cd + dd
    val p1 = ad / n1
    val p0 = cd / n0
    val allPos = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val orV = ad * dd / (bd * cd)
    val seOr = sqrt(lit(1.0) / ad + lit(1.0) / bd + lit(1.0) / cd + lit(1.0) / dd)
    val rrOk = col("a") > 0 && col("c") > 0 && col("b") >= 0
    val rrV = p1 / p0
    val seRr = sqrt(bd / (ad * n1) + dd / (cd * n0))
    val rdOk = n1 > 0 && n0 > 0
    val seRd = sqrt(p1 * (lit(1.0) - p1) / n1 + p0 * (lit(1.0) - p0) / n0)
    cells.select(
      (col("a") + col("b") + col("c") + col("d")).as("n"),
      col("a"), col("b"), col("c"), col("d"),
      when(allPos, orV).as("odds_ratio"),
      when(allPos, exp(log(orV) - lit(z) * seOr)).as("or_lo"),
      when(allPos, exp(log(orV) + lit(z) * seOr)).as("or_hi"),
      when(rrOk, rrV).as("risk_ratio"),
      when(rrOk, exp(log(rrV) - lit(z) * seRr)).as("rr_lo"),
      when(rrOk, exp(log(rrV) + lit(z) * seRr)).as("rr_hi"),
      when(rdOk, p1 - p0).as("risk_diff"),
      when(rdOk, p1 - p0 - lit(z) * seRd).as("rd_lo"),
      when(rdOk, p1 - p0 + lit(z) * seRd).as("rd_hi"))
  }

  /** First-order partial correlation r_xy·z — the linear association
    * between x and y with z held fixed, the screen for "is this
    * feature's signal just the confounder again?":
    * r_xy·z = (r_xy − r_xz·r_yz) / (√(1−r_xz²)·√(1−r_yz²)) with each
    * r the Pearson correlation.
    *
    * Scale shape: ONE map-side-combinable aggregate carries all nine
    * power sums; every sum folds as DECIMAL so the operands the double
    * arithmetic sees are exact (order-independent) and the oracle
    * replays the result bit-for-bit — the a26/t23 decimal-census
    * discipline. Rows with a null in ANY of the three columns are
    * excluded (complete-case, matching the pairwise formula's
    * requirement of one shared n). Returns one row:
    * (n, r_xy, r_xz, r_yz, r_partial); NULL r's on degenerate
    * variance, NULL r_partial when either control correlation is ±1. */
  def partialCorrelation(df: DataFrame, xCol: String, yCol: String,
                         zCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
    val x = d6(col(xCol))
    val y = d6(col(yCol))
    val z = d6(col(zCol))
    val sums = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull && col(zCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"), sum(z).as("__sz"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"), sum(z * z).as("__szz"),
        sum(x * y).as("__sxy"), sum(x * z).as("__sxz"), sum(y * z).as("__syz"))
    val nd = col("n").cast("double")
    def r(suv: String, su: String, sv: String, suu: String, svv: String) = {
      val den = sqrt(nd * col(suu).cast("double") -
          col(su).cast("double") * col(su).cast("double")) *
        sqrt(nd * col(svv).cast("double") -
          col(sv).cast("double") * col(sv).cast("double"))
      when(den > 0,
        (nd * col(suv).cast("double") -
          col(su).cast("double") * col(sv).cast("double")) / den)
    }
    val pden = sqrt(lit(1.0) - col("r_xz") * col("r_xz")) *
      sqrt(lit(1.0) - col("r_yz") * col("r_yz"))
    // a collinear control lands at |r| = 1 ∓ 2ulp, not exactly 1 (the
    // sqrt(q)·sqrt(q) denominator re-rounds), so the degeneracy guard
    // needs a margin; 1e-12 is ~5000 ulps — far above rounding noise,
    // far below any honestly-estimable correlation
    val ok = abs(col("r_xz")) < lit(1.0) - lit(1e-12) &&
      abs(col("r_yz")) < lit(1.0) - lit(1e-12)
    sums
      .select(col("n"),
        r("__sxy", "__sx", "__sy", "__sxx", "__syy").as("r_xy"),
        r("__sxz", "__sx", "__sz", "__sxx", "__szz").as("r_xz"),
        r("__syz", "__sy", "__sz", "__syy", "__szz").as("r_yz"))
      .select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
        when(ok,
          (col("r_xy") - col("r_xz") * col("r_yz")) / pden).as("r_partial"))
  }

  /** Bartlett's test for equal variances across k groups — [[leveneTest]]'s
    * parametric sibling (more powerful under normality, famously
    * sensitive to heavy tails; run both, believe their agreement):
    * χ² = [(N−k)·ln S_p² − Σ(n_i−1)·ln S_i²] / C with
    * C = 1 + (Σ 1/(n_i−1) − 1/(N−k)) / (3(k−1)) and the pooled
    * S_p² = Σ(n_i−1)S_i² / (N−k); χ² ~ χ²(k−1) under H₀.
    *
    * Scale shape: ONE map-side-combined per-group census of exact
    * decimal power sums, then ONE aggregate over the ≤k census rows —
    * the corpus is scanned once and every log/division happens over
    * census-derived doubles an external engine replays. Returns one
    * row (k, n, chi2, dof); chi2 NULL when any group has n < 2 or a
    * zero variance (ln undefined), or k < 2. */
  def bartlett(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
    val x = d6(col(valueCol))
    val cells = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("ni"), sum(x).as("__sx"), sum(x * x).as("__sxx"))
    val nd = col("ni").cast("double")
    // singleton groups null their census cells (ANSI divide-by-zero
    // guard); the __minN gate then nulls the whole statistic, which is
    // the documented contract — never a partial answer
    val s2 = when(col("ni") >= 2,
      (col("__sxx").cast("double") -
        col("__sx").cast("double") * col("__sx").cast("double") / nd) /
        (nd - lit(1.0)))
    val sums = cells
      .select(col("ni"), s2.as("__s2"))
      .agg(count(lit(1)).as("k"), sum("ni").as("n"),
        min("ni").as("__minN"), min("__s2").as("__minS2"),
        sum((col("ni") - 1).cast("double") * col("__s2")).as("__ssw"),
        sum((col("ni") - 1).cast("double") * log(col("__s2"))).as("__slog"),
        sum(when(col("ni") >= 2,
          lit(1.0) / (col("ni") - 1).cast("double"))).as("__sinv"))
    val nmk = (col("n") - col("k")).cast("double")
    val kd = col("k").cast("double")
    val sp2 = col("__ssw") / nmk
    val c = lit(1.0) + (col("__sinv") - lit(1.0) / nmk) / (lit(3.0) * (kd - lit(1.0)))
    sums.select(col("k"), col("n"),
      when(col("k") >= 2 && col("__minN") >= 2 && col("__minS2") > 0,
        (nmk * log(sp2) - col("__slog")) / c).as("chi2"),
      (col("k") - 1).as("dof"))
  }

  /** CUPED variance reduction (controlled experiments using pre-period
    * data; Deng, Xu, Kohavi & Walker, WSDM 2013): adjust the experiment
    * metric Y by the pre-period covariate X with the POOLED
    * θ = cov(X,Y)/var(X) and pooled mean X̄ — Y′ = Y − θ(X − X̄). Group
    * means keep their expectation while var(Y′) shrinks by the squared
    * X–Y correlation — the standard lever for tightening an A/B test
    * without more traffic. The report shows, per group, the raw and
    * adjusted means and the realized variance reduction.
    *
    * Scale shape: ONE map-side-combined per-group census of exact
    * decimal power sums; the pooled θ/X̄ fold from the same census
    * (a group-count-sized second aggregate, 1-row broadcast back), and
    * every output is row-local algebra over census rows — the corpus
    * is scanned once. Returns (group, n, mean_y, mean_cuped, var_y,
    * var_cuped, var_reduction); adjusted columns NULL when pooled
    * var(X) is degenerate, variance columns NULL at n < 2. */
  def cuped(df: DataFrame, groupCol: String, metricCol: String,
            covariateCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
    val x = d6(col(covariateCol))
    val y = d6(col(metricCol))
    val cells = df
      .filter(col(groupCol).isNotNull && col(metricCol).isNotNull &&
        col(covariateCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
    val pooled = cells.agg(
      sum("n").as("__pn"), sum("__sx").as("__psx"), sum("__sy").as("__psy"),
      sum("__sxx").as("__psxx"), sum("__sxy").as("__psxy"))
    def dd(name: String) = col(name).cast("double")
    val pn = dd("__pn")
    val thetaDen = pn * dd("__psxx") - dd("__psx") * dd("__psx")
    val theta = when(thetaDen > 0,
      (pn * dd("__psxy") - dd("__psx") * dd("__psy")) / thetaDen)
    val xbarPool = dd("__psx") / pn
    val nd = dd("n")
    val meanY = dd("__sy") / nd
    val meanX = dd("__sx") / nd
    val varY = when(col("n") >= 2,
      (dd("__syy") - dd("__sy") * dd("__sy") / nd) / (nd - lit(1.0)))
    val varX = (dd("__sxx") - dd("__sx") * dd("__sx") / nd) / (nd - lit(1.0))
    val covG = (dd("__sxy") - dd("__sx") * dd("__sy") / nd) / (nd - lit(1.0))
    cells.crossJoin(broadcast(pooled))
      .withColumn("__theta", theta)
      .select(col("__g").as(groupCol), col("n"),
        meanY.as("mean_y"),
        (meanY - col("__theta") * (meanX - xbarPool)).as("mean_cuped"),
        varY.as("var_y"),
        when(col("n") >= 2,
          varY - lit(2.0) * col("__theta") * covG +
            col("__theta") * col("__theta") * varX).as("var_cuped"),
        when(col("n") >= 2 && varY > 0,
          lit(1.0) - (varY - lit(2.0) * col("__theta") * covG +
            col("__theta") * col("__theta") * varX) / varY)
          .as("var_reduction"))
  }

  /** Per-group two-predictor ordinary least squares, closed form — the
    * regression census that answers "how does y move with x₁ holding x₂
    * fixed" without an iterative solver: the 2×2 normal equations in
    * centered sums, solved by Cramer's rule per census row.
    * ŷ = b₀ + b₁x₁ + b₂x₂ with
    * b₁ = (S₁ᵧS₂₂ − S₂ᵧS₁₂)/det, b₂ = (S₂ᵧS₁₁ − S₁ᵧS₁₂)/det,
    * det = S₁₁S₂₂ − S₁₂², b₀ = ȳ − b₁x̄₁ − b₂x̄₂, and
    * R² = (b₁S₁ᵧ + b₂S₂ᵧ)/Sᵧᵧ (the explained fraction).
    *
    * Scale shape: ONE map-side-combined per-group census of exact
    * decimal power sums (the cuped discipline — inputs cast to
    * decimal(18,6), so an external engine derives bit-identical doubles
    * before the shared closed-form algebra); everything after the
    * census is row-local arithmetic on group-count-sized data. Returns
    * (group, n, b0, b1, b2, r2); coefficients NULL when n < 3 or the
    * predictors are collinear (det ≤ 0), r2 additionally NULL when y is
    * constant. Listwise-complete: any null among (group, x₁, x₂, y)
    * drops the row. */
  def ols2(df: DataFrame, groupCol: String, x1Col: String, x2Col: String,
           yCol: String): DataFrame = {
    def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
    val (x1, x2, y) = (d6(col(x1Col)), d6(col(x2Col)), d6(col(yCol)))
    val cells = df
      .filter(col(groupCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("n"),
        sum(x1).as("__s1"), sum(x2).as("__s2"), sum(y).as("__sy"),
        sum(x1 * x1).as("__s11"), sum(x2 * x2).as("__s22"),
        sum(x1 * x2).as("__s12"), sum(x1 * y).as("__s1y"),
        sum(x2 * y).as("__s2y"), sum(y * y).as("__syy"))
    def dd(name: String) = col(name).cast("double")
    val nd = dd("n")
    // raw centered sums (the 1/n normalization cancels in the solve)
    val c11 = dd("__s11") - dd("__s1") * dd("__s1") / nd
    val c22 = dd("__s22") - dd("__s2") * dd("__s2") / nd
    val c12 = dd("__s12") - dd("__s1") * dd("__s2") / nd
    val c1y = dd("__s1y") - dd("__s1") * dd("__sy") / nd
    val c2y = dd("__s2y") - dd("__s2") * dd("__sy") / nd
    val cyy = dd("__syy") - dd("__sy") * dd("__sy") / nd
    val det = c11 * c22 - c12 * c12
    val fit = col("n") >= 3 && det > 0
    val b1 = when(fit, (c1y * c22 - c2y * c12) / det)
    val b2 = when(fit, (c2y * c11 - c1y * c12) / det)
    cells
      .withColumn("__b1", b1).withColumn("__b2", b2)
      .select(col("__g").as(groupCol), col("n"),
        (dd("__sy") / nd - col("__b1") * (dd("__s1") / nd) -
          col("__b2") * (dd("__s2") / nd)).as("b0"),
        col("__b1").as("b1"), col("__b2").as("b2"),
        when(fit && cyy > 0,
          (col("__b1") * c1y + col("__b2") * c2y) / cyy).as("r2"))
  }

  /** Welch's unequal-variance t statistic with the Welch–Satterthwaite
    * degrees of freedom — the two-sample mean comparison that doesn't
    * assume equal variances (the pooled test in the tableone layer
    * does; Welch is what you want when the two slices have different
    * spreads, which at corpus scale is the norm). The STATISTIC and
    * dof are exact census facts an external engine replays; the
    * p-value needs the t CDF and lives with the scipy-constant specs
    * (the t5 discipline).
    *
    * Scale shape: ONE map-side-combinable census aggregate over the
    * corpus (count + decimal power sums per group), then row-local
    * algebra over the 2-row census. Groups are identified as the
    * lexicographic (min, max) labels; `n_groups` exposes the input
    * cardinality, and t/dof are NULL unless it is exactly 2 (or a
    * variance is degenerate). Returns one row: (group_a, group_b,
    * n_groups, n_a, n_b, mean_a, mean_b, t_stat, dof). */
  def welchT(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(18,6)")
    val census = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"), sum(x).as("__sx"), sum(x * x).as("__sxx"))
    def side(tag: String, pick: org.apache.spark.sql.Column) = Seq(
      min(when(col("__g") === pick, col("__n"))).as(s"n_$tag"),
      min(when(col("__g") === pick, col("__sx"))).as(s"__sx_$tag"),
      min(when(col("__g") === pick, col("__sxx"))).as(s"__sxx_$tag"))
    // group labels via a broadcast 1-row aggregate of the same census
    // (exchange reuse plans the census once), not an unpartitioned
    // window — the v13-measured constant-key-window hazard class
    val agged = census
      .crossJoin(broadcast(census.agg(
        min("__g").as("__ga"), max("__g").as("__gb"))))
      .groupBy(col("__ga").as("group_a"), col("__gb").as("group_b"))
      .agg(countDistinct("__g").as("n_groups"),
        side("a", col("__ga")) ++ side("b", col("__gb")): _*)
    def stats(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      val m = col(s"__sx_$tag").cast("double") / n
      val v = (col(s"__sxx_$tag").cast("double") -
        col(s"__sx_$tag").cast("double") * col(s"__sx_$tag").cast("double") / n) /
        (n - lit(1.0))
      (n, m, v)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val se2 = va / na + vb / nb
    val ok = col("n_groups") === 2 && col("n_a") >= 2 && col("n_b") >= 2
    agged
      .select(col("group_a"), col("group_b"), col("n_groups"),
        col("n_a"), col("n_b"),
        when(col("n_a") >= 1, ma).as("mean_a"),
        when(col("n_b") >= 1, mb).as("mean_b"),
        when(ok && se2 > 0, (ma - mb) / sqrt(se2)).as("t_stat"),
        when(ok && se2 > 0,
          se2 * se2 / ((va / na) * (va / na) / (na - lit(1.0)) +
            (vb / nb) * (vb / nb) / (nb - lit(1.0)))).as("dof"))
  }

  /** Paired t statistic over per-subject (pre, post) pairs: the
    * one-sample t of the differences, t = d̄/(s_d/√n), dof = n − 1 —
    * the before/after screen where the pairing removes the
    * between-subject variance an unpaired test drowns in. Statistic
    * and dof only (the t5 p-value discipline). Differences fold as
    * DECIMAL so the census is exact. Returns one row:
    * (n, mean_diff, sd_diff, t_stat, dof). */
  def pairedT(df: DataFrame, preCol: String, postCol: String): DataFrame = {
    val d = (col(postCol).cast("decimal(18,6)") -
      col(preCol).cast("decimal(18,6)"))
    val sums = df
      .filter(col(preCol).isNotNull && col(postCol).isNotNull)
      .agg(count(lit(1)).as("n"), sum(d).as("__sd"), sum(d * d).as("__sdd"))
    val nd = col("n").cast("double")
    val mean = col("__sd").cast("double") / nd
    val varD = (col("__sdd").cast("double") -
      col("__sd").cast("double") * col("__sd").cast("double") / nd) /
      (nd - lit(1.0))
    sums.select(col("n"),
      when(col("n") >= 1, mean).as("mean_diff"),
      when(col("n") >= 2 && varD >= 0, sqrt(varD)).as("sd_diff"),
      when(col("n") >= 2 && varD > 0,
        mean / (sqrt(varD) / sqrt(nd))).as("t_stat"),
      when(col("n") >= 2, (col("n") - 1).cast("long")).as("dof"))
  }

  /** Benjamini-Hochberg FDR adjustment over a REPORT of test scores —
    * the multiple-testing step that belongs after any family of screens
    * here (per-variable tableone p-values, per-slice proportion tests,
    * per-feature drift flags): rank the m p-values ascending, adjusted
    * p(i) = min over j >= i of p(j)·m/j capped at 1, reject iff
    * adjusted <= alpha (equivalent to the classic step-up rule).
    *
    * Scale contract: the INPUT is a report (one row per test), not a
    * corpus — m is checks-sized by nature, so the two global windows
    * here order m rows, the same bounded-frame license every report
    * operator in [[Quality]] uses. Returns the input plus
    * (p_rank, p_adj, reject), ties broken by `keyCol` for a
    * deterministic, externally replayable order. */
  def bhAdjust(df: DataFrame, keyCol: String, pCol: String,
               alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val m = Window.partitionBy()
    val wRank = Window.orderBy(col(pCol), col(keyCol))
    val wTail = wRank.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.filter(col(pCol).isNotNull)
      .withColumn("__m", count(lit(1)).over(m))
      .withColumn("p_rank", row_number().over(wRank))
      // each row's own p·m/j factor is row-local once p_rank exists;
      // the step-up min then runs over the tail of the ranked order
      .withColumn("__factor", col(pCol).cast("double") * col("__m") / col("p_rank"))
      .withColumn("p_adj", least(lit(1.0), min(col("__factor")).over(wTail)))
      .withColumn("reject", col("p_adj") <= alpha)
      .drop("__m", "__factor")
  }
}
