package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for training-batch preparation: assign each document
  * to a fixed-token-budget "pack" (the groups a trainer concatenates into
  * one context window), wasting as little budget as possible.
  *
  * Optimal bin packing is NP-hard and inherently sequential; the
  * distributed shape here is the standard approximation: spread documents
  * deterministically into `partitions` GROUPS (group id = pmod(spread
  * key, nParts); the key defaults to xxhash64(id) — range partitioning
  * would sample boundaries, so two runs over a corpus large enough that
  * the sample is a subset could shift pack ids), then order each group by
  * (key, id) and run greedy next-fit packing independently inside it.
  * The group id is an EXPLICIT column, not the engine's physical
  * partition id, so the assignment is a pure function of the data: any
  * engine replaying (key, group, order) reproduces every pack id —
  * physical placement only affects WHERE a group is packed, never what
  * it's packed into. Packing quality matches greedy-on-a-random-
  * permutation (hash order IS a fixed random permutation), no stage is
  * sequential in corpus size, and the assignment is reproducible for a
  * fixed partition count at ANY scale — reruns and downstream joins see
  * identical pack ids. `mapPartitions` is warranted (SURVEY §7.3
  * last-resort rule): a running budget-remaining accumulator across rows
  * of a group is genuinely per-partition-imperative.
  *
  * Documents larger than the budget get a pack of their own (the trainer
  * decides whether to truncate or split); they never block other fills.
  *
  * Output: (idCol, n_tokens, pack_id) — pack_id = group << 32 | local
  * pack index, unique across the corpus.
  */
object Packing {

  /** `spreadKey` overrides the xxhash64(id) spread/order key — pass a
    * SQL-derivable permutation (e.g. a Lehmer key) when an external
    * engine must replay the exact assignment (the p3b oracle). */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        budget: Long, partitions: Int = 0,
                        spreadKey: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .select(col(idCol), col(tokenCol).cast(LongType).as("__tok"))
      .withColumn("__k", spreadKey.getOrElse(xxhash64(col(idCol))).cast(LongType))
      // in-plan null-key guard (the adjacentPairs contract pattern): a
      // null spread key would hash-partition on NULL while its group id
      // unboxes to 0, so two partitions could both emit "group 0" pack
      // ids — fail loudly instead of corrupting pack_id uniqueness.
      // The default xxhash64 key is never null; only a caller-supplied
      // spreadKey can trip this.
      .filter(assert_true(col("__k").isNotNull,
        lit("packByTokenBudget: spread key must not be null")).isNull)
      .withColumn("__grp", pmod(col("__k"), lit(nParts.toLong)))
      .repartition(nParts, col("__grp"))
      .sortWithinPartitions(col("__grp"), col("__k"), col(idCol))
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false)))
    keyed.mapPartitions { it =>
      // several groups can share a physical partition (hash placement);
      // the greedy state resets on every group boundary, so pack ids
      // never depend on which partition a group landed in
      var grp = -1L
      var pack = 0L
      var used = 0L
      it.map { r =>
        val tok = math.max(r.getAs[Long]("__tok"), 0L)
        val g = r.getAs[Long]("__grp")
        if (g != grp) { grp = g; pack = 0L; used = 0L }
        else if (used + tok > budget) { pack += 1; used = 0L }
        used += tok
        // an oversized doc overfills its own fresh pack; the NEXT doc
        // always opens a new one because used already exceeds budget
        Row(r.get(0), tok, (g << 32) | pack)
      }
    }(Encoders.row(outSchema))
  }

  /** Context-window chunking — the read-side complement of
    * [[packByTokenBudget]]: split each document into chunks of at most
    * `chunkTokens` whitespace tokens, consecutive chunks sharing
    * `overlap` tokens of context (the standard pretraining/RAG windowing
    * scheme). Chunk `i` covers token positions `[i*stride, i*stride +
    * chunkTokens)` with `stride = chunkTokens - overlap`; the chunk count
    * is `ceil(max(n - overlap, 1) / stride)`, so every token appears in
    * at least one chunk and no chunk is pure overlap. Documents with zero
    * tokens produce zero chunks. Chunk text is the tokens re-joined with
    * single spaces (token-normalized, matching [[TextAnalysis.tokens]]).
    *
    * Scale shape: a pure per-row projection (tokenize, explode the chunk
    * index range, slice) — no shuffle, no state; output rows ~ corpus
    * token count / stride regardless of document skew.
    *
    * Output: (idCol, chunk_id, n_tokens, chunk_text). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // integer ceil via truncating cast: operands are positive and far
      // below 2^53, so the double division is exact enough to truncate
      .withColumn("__nc",
        ((greatest(col("__n") - overlap, lit(1)) + lit(stride - 1)) / lit(stride)).cast("int"))
      .select(col(idCol), explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"), col("__toks"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)).as("__ck"))
      .select(col(idCol), col("chunk_id").cast(LongType).as("chunk_id"),
        size(col("__ck")).cast(LongType).as("n_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))
  }
}
