package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and tokenization over a corpus —
  * the Sennrich et al. subword algorithm (ACL 2016, the public BPE every
  * LLM tokenizer descends from), restructured so the corpus AND the word
  * vocabulary both stay distributed:
  *
  *  - The classic trainer collects the word-frequency table into driver
  *    memory and mutates it per merge round. Here the vocab is a
  *    `Dataset[WordSyms]` that never leaves the executors; each round is
  *    ONE map-side-combined pair-count aggregation (the shuffle carries
  *    (pair, partial-count) rows, bounded by distinct pairs — symbol
  *    bigrams, far smaller than the vocab) plus ONE narrow map applying
  *    the winning merge. The driver sees exactly one row per round (the
  *    argmax pair) and the final merge list — aggregate-sized state, the
  *    same collect discipline as the sketch family.
  *  - Word-frequency weighting means corpus size only matters in the
  *    ONE initial tokenize+count pass; every merge round costs
  *    O(distinct words), which is what lets 10 rounds run over 100 TB
  *    of text without 10 corpus scans.
  *
  * Ties on pair count break lexicographically — training is fully
  * deterministic for a given corpus, which is what lets the x17 oracle
  * pin the merge table as data-derived constants (verified against an
  * independent single-machine reference trainer in BpeSpec, the m9
  * golden-constant discipline).
  */
object Bpe {

  /** One vocab word as its current symbol sequence plus corpus frequency. */
  final case class WordSyms(syms: Seq[String], n: Long)

  /** One learned merge: rank (1-based, in learn order) and the joined pair. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Split a word into single-character symbols. No end-of-word marker:
    * this engine trains on whitespace-pretokenized words, so word
    * boundaries are already explicit (the marker variant adds nothing
    * but vocabulary here). */
  private[ops] def charSyms(w: String): Seq[String] = w.map(_.toString)

  /** Apply ONE merge greedily left-to-right within a symbol sequence —
    * the classic in-round rule ("aaa" under (a,a) becomes ["aa","a"]). */
  private[ops] def applyMerge(syms: Seq[String], left: String, right: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == left && syms(i + 1) == right) {
        out += left + right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `nMerges` BPE merges over the corpus' whitespace tokens
    * (lowercased). Stops early when the best remaining pair occurs fewer
    * than `minPairCount` times. Returns merges in learn order. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-sized pass: word frequencies
    val words = docs.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    var persisted: Dataset[WordSyms] =
      words.map(r => WordSyms(charSyms(r.getString(0)), r.getLong(1)))
    persisted.persist()
    persisted.count() // materialize so the rounds start from a computed vocab
    var vocab = persisted
    var depth = 0 // narrow maps stacked above the persisted handle
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    try {
      while (rank <= nMerges && !done) {
        // pair counts: one aggregation, map-side combined. The round's
        // ONLY job — the vocab rewrite below stays lazy, re-running at
        // most 2 stacked narrow maps above the persisted snapshot
        // (cheaper than a materialization job per round).
        val best = vocab.flatMap { ws =>
          if (ws.syms.length < 2) Iterator.empty
          else ws.syms.iterator.zip(ws.syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), ws.n) }
        }.toDF("pair", "n")
          .groupBy("pair").agg(sum("n").as("cnt"))
          .orderBy(col("cnt").desc, col("pair._1"), col("pair._2"))
          .head(1)
        if (best.isEmpty || best(0).getLong(1) < minPairCount) done = true
        else {
          val p = best(0).getStruct(0)
          val (l, r) = (p.getString(0), p.getString(1))
          merges += Merge(rank, l, r)
          vocab = vocab.map(ws => WordSyms(applyMerge(ws.syms, l, r), ws.n))
          depth += 1
          if (depth == 3) { // re-root the lineage every third round
            vocab.persist()
            vocab.count()
            persisted.unpersist()
            persisted = vocab
            depth = 0
          }
          rank += 1
        }
      }
    } finally {
      persisted.unpersist()
      if (!(vocab eq persisted)) vocab.unpersist() // no-op unless mid-window persist raced
    }
    merges.result()
  }

  /** BPE-encode one word under a rank table: repeatedly merge the
    * LOWEST-RANK adjacent pair present (the classic apply rule — rank
    * order, not positional order). */
  private[ops] def encodeWord(w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = charSyms(w)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val m = ranks.collectFirst { case (p, r) if r == bestRank => p }.get
        syms = applyMerge(syms, m._1, m._2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Tokenize the corpus with a trained merge list: adds
    * `bpe_tokens` (array<string>) and `n_bpe_tokens` per row. The rank
    * table rides a broadcast (merge lists are tiny by construction);
    * the encode is a pure per-row map — no shuffle at any scale. */
  def withBpeTokens(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("bpe_tokens", ArrayType(StringType, containsNull = false)))
      .add(StructField("n_bpe_tokens", IntegerType, nullable = false))
    val textIdx = inSchema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val ranks = ranksB.value
      rows.map { r =>
        val text = r.getString(textIdx)
        val toks =
          if (text == null) Seq.empty[String]
          else text.toLowerCase
            // same whitespace class as TextAnalysis.tokens, so the
            // encoder sees exactly the words the trainer counted
            .split(s"[${TextAnalysis.WhitespaceClass}]+").iterator.filter(_.nonEmpty)
            .flatMap(encodeWord(_, ranks)).toSeq
        Row.fromSeq(r.toSeq ++ Seq[Any](toks, toks.length))
      }
    }(enc)
  }

  /** The merge table as a DataFrame (rank, left, right) — the x17 query
    * surface. */
  def mergesFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right")
  }
}
