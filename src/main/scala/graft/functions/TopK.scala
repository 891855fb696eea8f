package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for [[TopK]]; ordered by score DESC then id
  * ASC, so ties are deterministic. */
final case class Scored(score: Double, id: Long)

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
class TopK(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], x: Scored): Array[Scored] = {
    if (buf.length == k && !lt(x, buf(k - 1))) buf
    else {
      // insertion position in the (already sorted) buffer
      var i = 0
      while (i < buf.length && lt(buf(i), x)) i += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[Scored](n)
      System.arraycopy(buf, 0, out, 0, i)
      out(i) = x
      System.arraycopy(buf, i, out, i + 1, n - i - 1)
      out
    }
  }

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val n = math.min(a.length + b.length, k)
      val out = new Array[Scored](n)
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

  override def finish(r: Array[Scored]): Array[Scored] = r

  override def bufferEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
}
