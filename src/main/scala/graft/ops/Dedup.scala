package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design notes (100 TB posture):
  *   - Exact dedup shuffles an 8-byte xxhash64 key, never the full text.
  *   - MinHash-LSH finds near-dup CANDIDATES with a band-bucket
  *     shuffle-join (O(n) with small constants), then verifies exact
  *     Jaccard only within buckets — no O(n^2) pair enumeration.
  *   - SimHash packs a document into one 64-bit long; near-dup test is a
  *     cheap `bit_count(a XOR b) <= t` inside bucket joins.
  *   - All signatures are computed as pure codegen'd column expressions
  *     (HOFs over token arrays); no UDFs, no driver collects.
  */
object Dedup {

  /** Word n-gram shingles of a text column (the near-dup unit). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct numeric shingle hashes of a text column: each token is
    * hashed once, n-gram hashes chain the token hashes. Runs as the
    * custom [[graft.functions.ShingleHash]] Catalyst expression — the
    * HOF equivalent (string slice+concat per shingle, interpreted
    * per-element) measured ~100x slower. */
  private[ops] def shingleHashes(text: Column, n: Int): Column =
    graft.functions.HashFunctions.shingleHash(TextAnalysis.tokens(lower(text)), n)

  /** MinHash signature: element k is the minimum of `xxhash64(s, seed=k)`
    * over the shingle-hash set. Custom expression — the `aggregate`/
    * `zip_with` formulation allocates a boxed 64-element array per
    * shingle per row (measured ~4 ms/row vs ~20 us/row). */
  def minHashSignature(text: Column, numHashes: Int = 64, shingleN: Int = 3): Column =
    graft.functions.HashFunctions.minHashSignature(shingleHashes(text, shingleN), numHashes)

  /** Jaccard over two distinct shingle-hash arrays — set semantics equal
    * to string-shingle Jaccard up to 2^-64 hash collisions, at a fraction
    * of the cost (long compares, no string allocation). */
  private[ops] def hashJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Estimated Jaccard similarity from two MinHash signatures. */
  def minHashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA).cast("double")

  /** Exact n-gram Jaccard similarity of two texts. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      greatest(size(array_union(sa, sb)), lit(1)).cast("double")
  }

  /** Exact deduplication: keep one deterministic representative (minimum
    * `idCol`) per distinct value of `text`. The shuffle key is the 64-bit
    * content hash, not the text; hash collisions are disambiguated by
    * grouping on (hash, text) — the text bytes only travel for rows that
    * share a hash partition, which is the same cost as any exact dedup. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactOn(df, idCol, Seq(textCol))

  /** Exact dedup over a composite key (e.g. (url, text) or every column). */
  def exactOn(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keyHash = xxhash64(keyCols.map(col): _*)
    val w = Window.partitionBy(keyHash +: keyCols.map(col): _*)
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-duplicate candidate pairs via MinHash-LSH banding.
    *
    * Signature is split into `bands` bands of `numHashes/bands` rows; two
    * documents land in the same bucket iff one band matches exactly.
    * Returns (id_a, id_b, est_jaccard, exact_jaccard) for candidate pairs
    * with exact Jaccard >= `threshold`, id_a < id_b, deduplicated across
    * bands. The join is an equi-join on (band_index, band_hash) — a plain
    * shuffle join that AQE can handle skew for; no cartesian product.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Persisted: read 3x (band explode + both rejoin sides). At cluster
    // scale the alternative — carrying text+signature through the 16-way
    // band explode and its shuffle — moves ~16x the bytes; shuffling the
    // 20-byte (id, band, hash) triple and re-joining is the scalable shape.
    // The verify stage never touches the raw text: exact Jaccard runs on
    // the numeric shingle-hash sets computed in the same pass as the
    // signature.
    val withSh = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("sh"))
    val withSig = withSh.select(col("id"), col("sh"),
      graft.functions.HashFunctions.minHashSignature(col("sh"), numHashes).as("sig")).persist()

    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

    val candidates = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")

    candidates
      .join(withSig.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        minHashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"),
        hashJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected edge list `(id_a, id_b)`.
    * Returns `(id, component)` with component = min id in the cluster.
    *
    * Near-dup edge lists are tiny relative to the corpus, so up to
    * `localThreshold` edges the components are solved with driver-side
    * union-find (O(E alpha(E)), zero Spark jobs beyond one collect) —
    * the iterative distributed loop pays several scheduling round-trips
    * per iteration, which dominates at small sizes. Larger edge lists
    * fall back to min-label propagation (one shuffle join + aggregation
    * per iteration, converging in O(cluster diameter)). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 10,
                          localThreshold: Long = 2000000L): DataFrame = {
    val e = edges.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val sample = e.limit((localThreshold + 1).toInt).collect()
    if (sample.length <= localThreshold) {
      // driver union-find with path halving; label = min id per set
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) {
          val p = parent(x)
          parent(x) = parent.getOrElse(p, p)
          x = parent(x)
        }
        x
      }
      sample.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keys.toSeq.map(id => org.apache.spark.sql.Row(id, find(id)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("component", org.apache.spark.sql.types.LongType, nullable = false)))
      import scala.jdk.CollectionConverters._
      edges.sparkSession.createDataFrame(rows.asJava, schema)
    } else distributedComponents(e, maxIter)
  }

  /** The at-scale path: iterative min-label propagation. */
  private[ops] def distributedComponents(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).persist()
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy("src").agg(min("component").as("nmin"))
      // change detection rides inside the update projection: one job per
      // iteration materializes the new labels AND counts the changes.
      val updated = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"),
          (col("nmin").isNotNull && col("nmin") < col("component")).as("__changed"))
        .persist()
      val changed = updated.filter(col("__changed")).count()
      labels.unpersist()
      labels = updated.drop("__changed")
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** Near-dedup keeping one representative (minimum id) per CONNECTED
    * near-dup cluster: A~B and B~C collapse to {A} even when A!~C.
    * The transitively-correct variant of [[minHashDedup]]. */
  def minHashDedupClustered(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 64, bands: Int = 16,
                            threshold: Double = 0.7): DataFrame = {
    val pairs = minHashLshPairs(df, idCol, textCol, numHashes, bands, threshold)
    val losers = connectedComponents(pairs.select("id_a", "id_b"))
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Near-dedup: drop all but the minimum-id member of each near-dup
    * candidate pair set (greedy transitive-lite pass: a doc survives iff
    * it is not the larger id of any qualifying pair). */
  def minHashDedup(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7): DataFrame = {
    val losers = minHashLshPairs(df, idCol, textCol, numHashes, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // --- SimHash ---------------------------------------------------------

  /** 64-bit SimHash of the token multiset: bit j of the result is 1 iff
    * sum over tokens of (+1 if bit j of xxhash64(token) else -1) > 0.
    * Custom [[graft.functions.SimHash64]] expression (one hash + 64
    * mask tests per token, unboxed). */
  def simHash(text: Column): Column =
    graft.functions.HashFunctions.simHash64(TextAnalysis.tokens(lower(text)))

  /** Hamming distance between two SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: documents whose 64-bit SimHashes differ in
    * <= maxHamming bits. Buckets by the 4 16-bit quarters of the hash
    * (pigeonhole: any pair within Hamming distance 3 shares at least one
    * exact quarter), so the join is an equi-join, not a cross join. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "quarter-banding is sound only for maxHamming <= 3")
    val withSig = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val banded = withSig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sim"), q * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "quarter").withColumnRenamed("col", "qhash")
    val a = banded.select(col("quarter"), col("qhash"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("quarter"), col("qhash"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("quarter", "qhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // --- embedding near-dup ----------------------------------------------

  /** Embedding-cosine near-duplicate pairs: pairs with cosine >=
    * `threshold`. Buckets via random-hyperplane LSH sign bits
    * (Similarity.lshBucket) to avoid the cartesian join; a pair is a
    * candidate when all `planes.size` sign bits agree. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, planes: Seq[Seq[Double]]): DataFrame = {
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.lshBucket(col(vecCol), planes).as("bucket"))
    val a = withB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
