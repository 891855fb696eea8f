package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorSum}

/** Distributed embedding clustering — the cluster-then-curate primitives a
  * training-data pipeline runs over corpus embeddings (topic bucketing,
  * cluster-balanced sampling, SemDeDup-style semantic grouping).
  *
  * Geometry is spherical (cosine), matching the rest of the similarity
  * stack ([[Similarity.trainCentroids]] trains the same objective on a
  * bounded driver-side sample for IVF coarse quantizers; `fit` here is
  * the FULL-CORPUS variant for when the clustering itself is the product,
  * not just an index).
  *
  * Scale shape of `fit`: each Lloyd iteration is ONE corpus scan — the
  * assignment rides a single [[graft.functions.NearestCentroids]]
  * expression (codebook inside the plan, no join), and the centroid
  * update is a map-side-combinable [[graft.functions.VectorSum]], so the
  * shuffle carries one dim-length buffer per (partition, cluster) and the
  * driver collects exactly k rows per iteration. Nothing row-sized ever
  * reaches the driver; corpus size only touches the scans.
  */
object Clustering {

  /** L2-normalized copy of an `array<double>` column (zero vectors pass
    * through unchanged — they cosine-score 0 against every centroid). */
  private[ops] def normalized(v: Column): Column = {
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    when(n === lit(0.0), v).otherwise(transform(v, x => x / n))
  }

  /** Deterministic farthest-point (k-means++-style) seeding over a
    * point set: start from the first point, then repeatedly add the
    * point least similar to everything already chosen (min of max
    * cosine; ties -> earliest point). Hash-random seeding routinely
    * draws two seeds from one dense cluster, and plain Lloyd cannot
    * escape that local optimum — farthest-point spreads the seeds
    * across the data's extremes instead. O(n·k·dim) on the driver,
    * bounded by the sample size, never the corpus. */
  private[ops] def farthestPointInit(pts: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val n = pts.length
    val kk = math.min(k, n)
    val chosen = new Array[Array[Double]](kk)
    chosen(0) = pts(0)
    // maxSim(i) = highest cosine between point i and any chosen seed
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    var c = 0
    while (c + 1 < kk) {
      var best = -1
      var bestSim = Double.PositiveInfinity
      var i = 0
      while (i < n) {
        val last = chosen(c)
        var dot = 0.0
        var j = 0
        val m = math.min(pts(i).length, last.length)
        while (j < m) { dot += pts(i)(j) * last(j); j += 1 }
        if (dot > maxSim(i)) maxSim(i) = dot
        if (maxSim(i) < bestSim) { bestSim = maxSim(i); best = i }
        i += 1
      }
      c += 1
      chosen(c) = pts(best)
    }
    chosen
  }

  /** Spherical k-means fitted on the WHOLE corpus with at most `iters`
    * Lloyd rounds (the budget; the loop exits early once the max centroid
    * displacement drops to `tol`, since a round is a full corpus scan).
    * Initial centroids default to [[farthestPointInit]] over a
    * bounded hash-deterministic sample (the `sampleSize` rows with the
    * smallest `(xxhash64(id), id)` — effectively random draws,
    * deterministic given the data; the [[Similarity.trainCentroids]]
    * sampling convention, with the id tiebreak making the order total).
    * The sample is init-only: every Lloyd round scans the full corpus.
    * A cluster that empties keeps its previous centroid. Returns the
    * codebook; feed it to [[quantize]] for assignments (and to
    * [[Similarity.topKIvf]] as a shared codebook).
    *
    * Exact arithmetic caveat, documented not hidden: partial-aggregation
    * merge order perturbs centroid low bits across runs, so two fits can
    * differ at ~1e-15; assignments are stable whenever cluster margins
    * exceed that (any real embedding corpus). */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 8, init: Option[Seq[Seq[Double]]] = None,
          sampleSize: Int = 4096, cache: Boolean = true,
          tol: Double = 1e-9): Seq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val pts = corpus.select(
      normalized(col(vecCol).cast("array<double>")).as("__v"), col(idCol).as("__id"))
    // fit is EAGER (returns a codebook, not a lazy plan), so a persist
    // scoped to this call cannot leak — the connectedComponents pattern.
    // Every Lloyd round (and the init sample) re-reads and re-normalizes
    // the corpus otherwise: iters+1 source scans vs one scan + iters
    // cache reads (sf10 measured 18.5 s -> see SURVEY §6.3).
    // MEMORY_AND_DISK: a corpus too big for executor memory spills
    // instead of failing; pass cache = false to keep the pure re-scan
    // plan (e.g. when the source scan is cheaper than materializing).
    val cached =
      if (cache) pts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else pts
    try {
      var cents: Seq[Seq[Double]] = init.getOrElse {
        val sample = cached.orderBy(xxhash64(col("__id")), col("__id"))
          .limit(math.max(sampleSize, k))
          .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
        require(sample.nonEmpty, "cannot fit on an empty corpus")
        farthestPointInit(sample, k).map(_.toSeq).toSeq
      }
      require(cents.nonEmpty, "cannot fit on an empty corpus")
      val dim = cents.head.length
      val vsum = udaf(new VectorSum(dim), VectorSumEncoders.seqDouble)
      var iter = 0
      var moved = Double.MaxValue
      // early stop: each Lloyd round is a FULL corpus scan, so once the
      // codebook stops moving (max centroid displacement <= tol, a
      // k x dim driver-side check) further rounds are pure waste —
      // `iters` is the budget, convergence the usual exit
      while (iter < iters && moved > tol) {
        val agg = cached
          .withColumn("__c", element_at(HashFunctions.nearestCentroids(col("__v"), cents, 1), 1))
          .groupBy(col("__c")).agg(vsum(col("__v")).as("__s"))
          .collect()
        val next = cents.toArray
        agg.foreach { r =>
          val c = r.getInt(0)
          val s = r.getSeq[Double](1)
          val norm = math.sqrt(s.map(x => x * x).sum)
          // normalized sum of unit vectors IS the spherical mean direction;
          // a zero-sum (vectors cancel exactly) keeps the old centroid
          if (norm > 0) next(c) = s.map(_ / norm)
        }
        moved = cents.zip(next).map { case (a, b) =>
          math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        }.max
        cents = next.toSeq
        iter += 1
      }
      cents
    } finally {
      if (cache) { cached.unpersist(blocking = false); () }
    }
  }

  /** Vector quantization: every corpus row keyed by its highest-cosine
    * codebook centroid (ties break to the lowest centroid index —
    * [[graft.functions.NearestCentroids]] semantics), with the exact
    * cosine to that centroid. One scan; the k-row codebook frame joins
    * broadcast, so the corpus never shuffles. */
  def quantize(corpus: DataFrame, idCol: String, vecCol: String,
               cents: Seq[Seq[Double]]): DataFrame = {
    require(cents.nonEmpty, "codebook must not be empty")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("centroid_id", "__cv")
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("centroid_id",
        element_at(HashFunctions.nearestCentroids(col("__v"), cents, 1), 1))
      .join(broadcast(cdf), Seq("centroid_id"))
      .select(col(idCol), col("centroid_id"),
        HashFunctions.cosineSim(col("__v"), col("__cv")).as("cosine"))
  }

  /** SemDeDup-style semantic deduplication: quantize the corpus against a
    * codebook, then inside each cluster drop every row DOMINATED by a
    * lower-id row at cosine >= `tau` (the min-id dominance rule — one
    * deterministic definition both engines can evaluate, vs the paper's
    * unspecified iteration order). Pairs are only compared WITHIN a
    * cluster: that is the method's entire scale story — candidate pairs
    * fall from n² to Σ cluster_size², at the documented recall trade that
    * a near-dup pair straddling a cluster boundary survives (use
    * [[Dedup.embeddingNearDupPairs]] when cross-cluster recall matters
    * more than cost). Returns the surviving (id, centroid_id) rows.
    *
    * Scale shape: one corpus scan for assignment, then a self equi-join
    * on `centroid_id` — both sides the SAME plan, so the exchange is
    * planned once and reused — and an id anti-join back (NOT broadcast-
    * hinted: the removed set scales with the corpus; AQE promotes it to
    * broadcast at runtime whenever it is actually small).
    * `maxClusterSize` caps the quadratic term: clusters above the cap are
    * EXEMPT from dedup (all their rows survive) rather than silently
    * exploding the pair count — 100k-row cells would mean 10^10 cosine
    * evaluations EACH, so the default cap is 10000 (≤ 10^8 candidate
    * pairs per cell, seconds of codegen'd cosine work). Size the codebook
    * so cells stay under it: k ≈ n / 5000 keeps the expected cell size
    * well inside the cap at any corpus scale; a tripped cap is the signal
    * to refit with larger k, not to raise the cap. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    cents: Seq[Seq[Double]], tau: Double,
                    maxClusterSize: Int = 10000): DataFrame = {
    require(cents.nonEmpty, "codebook must not be empty")
    val assigned = corpus.select(
      col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"),
      element_at(HashFunctions.nearestCentroids(col(vecCol).cast("array<double>"), cents, 1), 1)
        .as("centroid_id"))
    val sizes = assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("__n"))
    val inScope = assigned.join(sizes, Seq("centroid_id"))
      .filter(col("__n") <= maxClusterSize).drop("__n")
    val a = inScope.select(col("centroid_id"), col("__id").as("__id_a"), col("__v").as("__v_a"))
    val b = inScope.select(col("centroid_id"), col("__id").as("__id_b"), col("__v").as("__v_b"))
    val removed = a.join(b, Seq("centroid_id"))
      .filter(col("__id_a") < col("__id_b") &&
        HashFunctions.cosineSim(col("__v_a"), col("__v_b")) >= tau)
      .select(col("__id_b").as("__removed")).distinct()
    assigned.join(removed, col("__id") === col("__removed"), "left_anti")
      .select(col("__id").as(idCol), col("centroid_id"))
  }

  /** Per-cluster profile of a fitted codebook over a corpus: size, mean
    * cosine to the assigned centroid (cohesion), and the majority value
    * of `labelCol` with its share (purity) when a ground-truth label is
    * available. Every centroid id 0..k-1 emits a row — an emptied
    * cluster profiles as (n=0, nulls) instead of vanishing, so the
    * output cardinality is exactly k regardless of assignment noise. */
  def clusterProfile(corpus: DataFrame, idCol: String, vecCol: String,
                     cents: Seq[Seq[Double]], labelCol: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = quantize(corpus, idCol, vecCol, cents)
    val assigned = labelCol match {
      case Some(l) => q.join(corpus.select(col(idCol), col(l).as("__label")), Seq(idCol))
      case None    => q.withColumn("__label", lit(null).cast("string"))
    }
    val perLabel = assigned.groupBy(col("centroid_id"), col("__label"))
      .agg(count(lit(1)).as("__nl"), sum(col("cosine")).as("__sc"))
    val perCluster = perLabel.groupBy(col("centroid_id")).agg(
      sum(col("__nl")).as("n"),
      (sum(col("__sc")) / sum(col("__nl"))).as("mean_cosine"),
      max_by(col("__label"), struct(col("__nl"), col("__label").cast("string"))).as("top_label"),
      (max(col("__nl")).cast("double") / sum(col("__nl")).cast("double")).as("purity"))
    val ids = spark.range(cents.length).select(col("id").cast("int").as("centroid_id"))
    ids.join(perCluster, Seq("centroid_id"), "left")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("mean_cosine"), col("top_label"), col("purity"))
  }
}

private[ops] object VectorSumEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val seqDouble: org.apache.spark.sql.Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
