package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance scoring over a document corpus — the retrieval
  * primitive for corpus exploration ("show me the docs most about X") and
  * for contamination triage (rank corpus docs against a benchmark prompt).
  *
  * Design for scale: the query is a SMALL literal term set, so per-doc
  * term frequencies are computed INSIDE the row projection with
  * higher-order array functions (one `filter(tokens, t -> t = term)` per
  * query term — no explode, no (doc, term) shuffle). The only exchanges
  * in a scoring run are one single-row corpus-statistics aggregate
  * (N, avgdl, per-term document frequencies — broadcast back) and the
  * final top-k TakeOrdered. A 100 TB corpus is scored in one scan.
  */
object Search {

  /** Lowercased whitespace tokens of `textCol` — the same tokenizer the
    * rest of the text stack uses (TextAnalysis.tokens). */
  private def toks(textCol: Column): Column = TextAnalysis.tokens(lower(textCol))

  /** Per-document BM25 scores for `queryTerms` (Okapi BM25 with the
    * Lucene +1 idf floor, so idf is strictly positive even for terms in
    * more than half the corpus):
    *
    *   idf(t)   = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )
    *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·dl(d)/avgdl))
    *
    * Output: (idCol, dl, score) for documents matching ≥1 term.
    *
    * @param df         corpus
    * @param idCol      document id column
    * @param textCol    text column
    * @param queryTerms literal query terms (lowercased; deduplicated) */
  def bm25(df: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    require(terms.nonEmpty, "need at least one query term")
    require(terms.size <= 64, "query term set must stay projection-sized (<= 64)")
    def tfCol(i: Int) = s"__tf$i"
    // tokenize ONCE per row in a named projection step (guaranteed sharing
    // across the per-term filters — no reliance on expression CSE), then
    // tf per term via array filter — pure projection, no explode
    val withTf = df.withColumn("__tk", toks(col(textCol))).select(
      col(idCol) +: size(col("__tk")).as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__tk"), x => x === lit(t))).as(tfCol(i))
        }: _*)
    // corpus statistics: one 1-row aggregate (broadcast back into the scan)
    val statAggs = count(lit(1)).as("__n") +: avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum(when(col(tfCol(i)) > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    // length norm k1·(1-b + b·dl/avgdl): shared by every term's score.
    // The operation ORDER here is load-bearing for the oracle compare —
    // the paired DuckDB SQL spells the identical association.
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("__dl").cast("double") / col("__avgdl"))
    val termScore = terms.indices.map { i =>
      val tf = col(tfCol(i)).cast("double")
      val idf = log((col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5) + 1.0)
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)
    scored
      .select(col(idCol), col("__dl").cast("long").as("dl"), termScore.as("score"))
      .filter(col("score") > 0.0)
  }

  /** Top-k BM25 retrieval: highest score first, ties broken by id. The
    * limit plans as TakeOrdered — per-partition heaps, no global sort. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(df, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
