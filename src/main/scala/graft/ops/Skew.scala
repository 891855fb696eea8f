package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for heavy-hitter keys.
  *
  * Spark's AQE rebalances skewed JOINS automatically, but a skewed
  * `groupBy` whose aggregation buffer explodes on one key still bottoms
  * out on a single task. Two-stage salted aggregation splits each key
  * into `saltFactor` subkeys, partially aggregates, then merges — the
  * classic pattern, expressed so the partial stays map-side combinable.
  */
object Skew {

  /** Decomposable aggregate spec: the partial runs per (key, salt), the
    * merge recombines partials per key. */
  final case class SaltedAgg(partial: Seq[Column], merge: Seq[Column])

  /** count + sum + min + max (the common decomposable set) over `value`. */
  def countSumMinMax(value: String): SaltedAgg = SaltedAgg(
    partial = Seq(
      count(col(value)).as(s"__${value}_n"),
      sum(col(value)).as(s"__${value}_s"),
      min(col(value)).as(s"__${value}_mn"),
      max(col(value)).as(s"__${value}_mx")),
    merge = Seq(
      sum(col(s"__${value}_n")).as(s"${value}_n"),
      sum(col(s"__${value}_s")).as(s"${value}_sum"),
      min(col(s"__${value}_mn")).as(s"${value}_min"),
      max(col(s"__${value}_mx")).as(s"${value}_max")))

  /** Two-stage aggregation over possibly-skewed `keys`: stage 1 groups
    * by (keys, random salt in [0, saltFactor)) so a heavy hitter spreads
    * over `saltFactor` tasks; stage 2 merges the partials per key. For
    * uniformly distributed keys this adds one cheap extra shuffle of
    * pre-aggregated rows; for skewed keys it removes the straggler.
    *
    * @param saltCol optional unique/stable column to derive the salt from
    *                instead of the full row content. Use it when (a) a
    *                heavy key is dominated by IDENTICAL duplicate rows —
    *                content hashing gives those one salt and the
    *                mitigation silently degrades back to a single-task
    *                straggler — or (b) the frame has MapType columns,
    *                which xxhash64 cannot hash. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], agg: SaltedAgg,
                      saltFactor: Int = 32, seed: Long = 42L,
                      saltCol: Option[String] = None): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // The salt must be DETERMINISTIC per row: with a nondeterministic salt
    // (partition id, monotonically_increasing_id, rand), a fetch-failure-
    // triggered map-task recomputation re-salts rows into different reduce
    // partitions and partial aggregates duplicate or vanish (the
    // SPARK-23207 hazard class). Hashing content (or the caller's stable
    // id) + seed keeps recomputed map output identical while still
    // spreading a heavy key over saltFactor subkeys.
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val saltBasis: Seq[Column] = saltCol match {
      case Some(c) => Seq(col(c))
      case None =>
        require(!df.schema.exists(f => hasMap(f.dataType)),
          "saltedAggregate: row-content salting cannot hash MapType columns — " +
            "pass saltCol = Some(<unique/stable id column>)")
        df.columns.map(col).toSeq
    }
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltBasis :+ lit(seed): _*), lit(saltFactor)))
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(agg.partial.head, agg.partial.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(agg.merge.head, agg.merge.tail: _*)
  }

  /** Skew DIAGNOSIS report — the planning step the salted operators
    * assume someone already did: which keys are heavy, how heavy, and
    * what salt factor would level each across the cluster. Returns one
    * row per confirmed heavy key: exact `cnt`, `share` of the corpus,
    * and `suggested_salt` = ceil(share · partitions) — the number of
    * tasks that key's rows would need to occupy for its partition to
    * shrink back to an average-sized one.
    *
    * Scale shape: the x9 sketch-then-recount pattern — a Misra-Gries
    * pass surfaces ≤ `maxKeys` candidates (the detection shuffle
    * carries one bounded map per partition, never keys), then ONE
    * aggregate recounts the candidates exactly (MG overestimates; the
    * recount kills false positives) against a 1-row broadcast total.
    * Keys below `minShare` are dropped — they need no salting. */
  def skewReport(df: DataFrame, keyCol: String, partitions: Int,
                 maxKeys: Int = 64, minShare: Double = 0.01): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    require(minShare >= 0.0 && minShare <= 1.0, s"minShare must be in [0, 1]")
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGries(maxKeys), org.apache.spark.sql.Encoders.STRING)
    val candidates: Seq[String] = df
      .select(col(keyCol).cast("string").as("__k")).filter(col("__k").isNotNull)
      .agg(mg(col("__k")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("k"))
      .collect().map(_.getString(0)).toSeq
    val total = df.agg(count(lit(1)).as("__total"))
    val share = col("cnt").cast("double") / col("__total").cast("double")
    df.filter(col(keyCol).cast("string").isin(candidates: _*))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(share >= minShare)
      .select(col(keyCol), col("cnt"),
        round(share + lit(5e-10), 6).as("share"),
        ceil(share * partitions).cast("long").as("suggested_salt"))
      .orderBy(col("cnt").desc, col(keyCol))
  }

  /** [[saltedJoin]] with the replication cost paid ONLY for keys that are
    * actually hot: a Misra-Gries sketch over the fact keys finds up to
    * `maxHotKeys` heavy-hitter candidates (the detection shuffle carries
    * one small map per partition — never the keys themselves, no extra
    * wide shuffle), hot fact rows take the salted join against the dim
    * rows of those keys, and everything else takes the untouched plain
    * join. Replicated-side cost drops from `saltFactor * |dim|` to
    * `saltFactor * |hotKeys|` (≤ saltFactor * maxHotKeys rows) — on a
    * skew-free input the operator degrades to the plain join plus one
    * cheap sketch pass, instead of paying the full replication anyway.
    *
    * All MG candidates are treated as hot: over-salting a merely-warm key
    * costs a handful of replicated dim rows, while under-salting a truly
    * heavy one recreates the straggler — MG's guarantee (every key with
    * freq > N/(maxHotKeys+1) surfaces) bounds the miss direction. */
  def hotSaltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    saltFactor: Int = 32, maxHotKeys: Int = 64, seed: Long = 42L,
                    saltCol: Option[String] = None): DataFrame = {
    require(maxHotKeys >= 1, "maxHotKeys must be >= 1")
    // The hot path unions the salted and cold join branches by name; with
    // identical key names that union fails while the skew-free path would
    // succeed — reject the shape up front so behavior never depends on
    // data-dependent skew detection.
    require(factKey != dimKey,
      s"hotSaltedJoin: fact and dim key columns must have distinct names (both are '$factKey') — alias one side first")
    // Detection pass: Misra-Gries over a canonical string form of the key
    // (the sketch needs one hashable representation; this cast exists only
    // here, in one narrow pre-aggregated scan — NOT in the branch filters).
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGries(maxHotKeys), org.apache.spark.sql.Encoders.STRING)
    val hotKeyStrs: Seq[String] = fact
      .select(col(factKey).cast("string").as("__k")).filter(col("__k").isNotNull)
      .agg(mg(col("__k")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("k"))
      .collect().map(_.getString(0)).toSeq
    lazy val plain = fact.join(dim, fact(factKey) === dim(dimKey))
    if (hotKeyStrs.isEmpty) plain
    else {
      // Branch predicates compare in the fact key's NATIVE type: each hot
      // key string becomes a `lit(s).cast(factType)` literal that Catalyst
      // constant-folds, so the per-row work is native equality against
      // <= maxHotKeys constants — no per-row cast. Correctness does not
      // depend on the string round-trip: hotFact and coldFact partition the
      // fact by the SAME predicate, and hotDim keeps every dim row equal to
      // a hot literal under the join's own binary-comparison coercion (the
      // r6 string-vs-string compare missed hot dim rows when the two sides
      // had different numeric types, e.g. long "7" vs decimal "7.00").
      val factType = fact.schema(factKey).dataType
      val typedHotKeys: Seq[Column] = hotKeyStrs.map(s => lit(s).cast(factType))
      // coalesce(…, false) makes each predicate total: a null fact key (or a
      // hot literal that failed the cast) evaluates false everywhere, so the
      // row goes to the cold branch where the inner join drops/keeps it
      // exactly as the plain join would — hot + cold is always a partition.
      def isHot(key: Column): Column =
        typedHotKeys.map(k => coalesce(key === k, lit(false))).reduce(_ || _)
      val hotFact = fact.filter(isHot(col(factKey)))
      val coldFact = fact.filter(!isHot(col(factKey)))
      val hotDim = dim.filter(isHot(col(dimKey)))
      saltedJoin(hotFact, hotDim, factKey, dimKey, saltFactor, seed, saltCol)
        .unionByName(coldFact.join(dim, coldFact(factKey) === dim(dimKey)))
    }
  }

  /** Skew-resistant equi-join of a big (possibly key-skewed) fact side
    * against a dimension side that is too large to broadcast: the fact
    * side gets a deterministic row-content salt in [0, saltFactor), the
    * dimension side is replicated once per salt value, and the join runs
    * on (key, salt) — a heavy fact key spreads over `saltFactor` tasks
    * instead of serializing into one.
    *
    * AQE's skew-join split already handles most sort-merge skew at
    * runtime; use this when the skew mitigation must be IN THE PLAN —
    * e.g. the output feeds a co-partitioned consumer AQE would re-plan
    * around, or the join runs inside a cached/streaming subtree where
    * AQE does not apply. Cost: `saltFactor * |dim|` shuffle rows on the
    * replicated side — the standard trade.
    *
    * Same determinism rule as [[saltedAggregate]] (recomputed map tasks
    * must re-derive identical salts), and the same identical-duplicate
    * caveat: fact rows that are bit-for-bit equal hash to one salt; pass
    * `saltCol` pointing at a unique/stable column when heavy keys are
    * dominated by full-row duplicates. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltFactor: Int = 32, seed: Long = 42L,
                 saltCol: Option[String] = None): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltBasis: Seq[Column] = saltCol match {
      case Some(c) => Seq(col(c))
      case None => fact.columns.map(col).toSeq
    }
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltBasis :+ lit(seed): _*), lit(saltFactor)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
