package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch: a bounded `k`-counter summary of a
  * token stream that never shuffles the vocabulary.
  *
  * Guarantee (classic): after summarizing N items, every item with true
  * frequency > N/(k+1) is PRESENT in the sketch, and each kept counter
  * undercounts its item's true frequency by at most N/(k+1). The merge
  * (counter-wise sum, then subtract the (k+1)-th largest count and drop
  * non-positive counters — Agarwal et al.'s mergeable-summaries rule)
  * preserves that bound, so the Aggregator is decomposable and Spark runs
  * it with map-side partial aggregation: the shuffle carries one k-entry
  * map per partition instead of the full vocabulary.
  *
  * This is the scale path complementing the exact top-k (x8_vocab): the
  * exact query shuffles `distinct-token` rows (fine while the vocabulary
  * fits a shuffle; it is itself map-side combined), while the sketch
  * bounds shuffle bytes by k * partitions regardless of vocabulary size —
  * the right trade once the vocabulary itself is shuffle-dominant.
  * Estimates are LOWER bounds; a caller needing exact counts for the
  * survivors re-joins them against a counted subset.
  */
class MisraGries(k: Int)
  extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]]
  with Serializable {
  require(k >= 1, "k must be >= 1")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
    if (item != null) {
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all step; drop zeros. Amortized O(1) per item: each
          // decrement pass removes >= 1 counter and is paid for by the
          // insertions that filled the map.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // leaves <= k counters and keeps the N/(k+1) undercount bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    ExpressionEncoder[mutable.HashMap[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Merge two FINALIZED summaries under the same mergeable-summaries
    * rule the Aggregator's in-plan merge uses — the state-maintenance
    * entry point: keep yesterday's k-entry summary, summarize only the
    * delta batch, merge driver-side. Preserves the N/(k+1) bound over
    * the COMBINED stream, so "every token with combined frequency >
    * N/(k+1) is present" still holds for the merged map. */
  def mergeSummaries(a: Map[String, Long], b: Map[String, Long],
                     k: Int): Map[String, Long] = {
    require(k >= 1, "k must be >= 1")
    val m = mutable.HashMap.empty[String, Long]
    a.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    b.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    if (m.size > k) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      m.filterInPlace((_, c) => c - cut > 0)
      m.mapValuesInPlace((_, c) => c - cut)
    }
    m.toMap
  }
}
