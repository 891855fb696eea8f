package graft.functions

import scala.reflect.ClassTag
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for [[TopK]]; ordered by score DESC then id
  * ASC, so ties are deterministic. */
final case class Scored(score: Double, id: Long)

/** One (score, term) candidate for [[TopKTerms]]; ordered by score DESC
  * then term ASC. */
final case class ScoredTerm(score: Double, term: String)

/** Bounded top-k per group as a typed `Aggregator` — the map-side-
  * combinable alternative to `row_number().over(partitionBy(key).orderBy
  * (score desc)) <= k`. A window must shuffle and SORT every row of every
  * group (O(n log n) per group, full materialization); this aggregator
  * keeps a k-element sorted buffer per group in the partial aggregate, so
  * the shuffle carries at most k rows per (partition, group) and total
  * work is O(n log k). At 100 TB the window's per-group sort is the
  * difference between a top-5 query and a global sort.
  *
  * The buffer is a sorted array (insertion into ≤ k elements beats a heap
  * for the small k this is meant for); merge is a truncated sorted-array
  * merge, associative and commutative, so any partial-aggregation shape
  * gives the same result.
  */
abstract class BoundedTopK[T: ClassTag](k: Int) extends Aggregator[T, Array[T], Array[T]] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** Strict "ranks ahead of": total order, ties impossible for distinct
    * inputs (implementations tiebreak on the payload). */
  protected def lt(a: T, b: T): Boolean

  override def zero: Array[T] = Array.empty

  override def reduce(buf: Array[T], x: T): Array[T] = {
    if (buf.length == k && !lt(x, buf(k - 1))) buf
    else {
      // insertion position in the (already sorted) buffer
      var i = 0
      while (i < buf.length && lt(buf(i), x)) i += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[T](n)
      System.arraycopy(buf, 0, out, 0, i)
      out(i) = x
      System.arraycopy(buf, i, out, i + 1, n - i - 1)
      out
    }
  }

  override def merge(a: Array[T], b: Array[T]): Array[T] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val n = math.min(a.length + b.length, k)
      val out = new Array[T](n)
      var (i, j, o) = (0, 0, 0)
      while (o < n) {
        out(o) =
          if (j >= b.length || (i < a.length && lt(a(i), b(j)))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        o += 1
      }
      out
    }
  }

  override def finish(r: Array[T]): Array[T] = r
}

class TopK(k: Int) extends BoundedTopK[Scored](k) {
  override protected def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  override def bufferEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
}

/** One (priority, id) candidate for [[BottomKIds]]; ordered by priority
  * ASC then id ASC. */
final case class Prioritized(priority: Long, id: Long)

/** Bounded bottom-k per group on a long priority — the mergeable
  * deterministic-sampling sketch: with priority = a seeded hash of the
  * row id, the k smallest priorities per group ARE a uniform
  * without-replacement sample of the group (bottom-k sampling), and the
  * bounded buffer means the shuffle carries at most k rows per
  * (partition, group) instead of the full per-stratum sort
  * `stratifiedTake`'s window pays. Same complexity argument as
  * [[BoundedTopK]]: O(n log k) total, no group ever materializes. */
class BottomKIds(k: Int) extends BoundedTopK[Prioritized](k) {
  override protected def lt(a: Prioritized, b: Prioritized): Boolean =
    a.priority < b.priority || (a.priority == b.priority && a.id < b.id)
  override def bufferEncoder: Encoder[Array[Prioritized]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Prioritized]]()
  override def outputEncoder: Encoder[Array[Prioritized]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Prioritized]]()
}

/** One (score, rel, id) candidate for [[TopKRel]]: a ranking score plus
  * the relevance grade it carries into gain computation; ordered by
  * score DESC then id ASC. */
final case class RelScored(score: Double, rel: Double, id: Long)

/** [[BoundedTopK]] over (score, relevance, id) — the ranking-metric
  * workhorse: per group, the k best-scored items WITH their relevance
  * grades ride the bounded partial aggregate, so NDCG@k over a corpus
  * needs no per-group sort window. Passing the relevance as the score
  * gives the ideal (IDCG) ranking from the same aggregator. */
class TopKRel(k: Int) extends BoundedTopK[RelScored](k) {
  override protected def lt(a: RelScored, b: RelScored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  override def bufferEncoder: Encoder[Array[RelScored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[RelScored]]()
  override def outputEncoder: Encoder[Array[RelScored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[RelScored]]()
}

class TopKTerms(k: Int) extends BoundedTopK[ScoredTerm](k) {
  override protected def lt(a: ScoredTerm, b: ScoredTerm): Boolean =
    a.score > b.score || (a.score == b.score && a.term < b.term)
  override def bufferEncoder: Encoder[Array[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredTerm]]()
  override def outputEncoder: Encoder[Array[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredTerm]]()
}
