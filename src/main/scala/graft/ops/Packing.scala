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
  * deterministically across partitions (HASH-partition on xxhash64(id) —
  * range partitioning would sample boundaries, so two runs over a corpus
  * large enough that the sample is a subset could shift pack ids), then
  * sort each partition by (hash, id) and run greedy next-fit packing
  * independently inside it. Packing quality matches
  * greedy-on-a-random-permutation (hash order IS a fixed random
  * permutation), no stage is sequential in corpus size, and the
  * assignment is reproducible for a fixed partition count at ANY scale —
  * reruns and downstream joins see identical pack ids. `mapPartitions`
  * is warranted (SURVEY §7.3 last-resort rule): a running
  * budget-remaining accumulator across rows of a partition is genuinely
  * per-partition-imperative.
  *
  * Documents larger than the budget get a pack of their own (the trainer
  * decides whether to truncate or split); they never block other fills.
  *
  * Output: (idCol, n_tokens, pack_id) — pack_id = partition << 32 | local
  * pack index, unique across the corpus.
  */
object Packing {

  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .select(col(idCol), col(tokenCol).cast(LongType).as("__tok"))
      .withColumn("__k", xxhash64(col(idCol)))
      .repartition(nParts, col("__k"))
      .sortWithinPartitions(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id().cast(LongType))
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false)))
    keyed.mapPartitions { it =>
      var pack = 0L
      var used = 0L
      var first = true
      it.map { r =>
        val tok = math.max(r.getAs[Long]("__tok"), 0L)
        val pid = r.getAs[Long]("__pid")
        if (first) { first = false; used = 0L }
        else if (used + tok > budget) { pack += 1; used = 0L }
        used += tok
        // an oversized doc overfills its own fresh pack; the NEXT doc
        // always opens a new one because used already exceeds budget
        Row(r.get(0), tok, (pid << 32) | pack)
      }
    }(Encoders.row(outSchema))
  }
}
