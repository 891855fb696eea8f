package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate summing `array<double>` vectors element-wise — the
  * centroid-update kernel for distributed k-means (and any per-group
  * vector mean: divide by the group count afterwards).
  *
  * Decomposable (reduce/merge associative + commutative), so Spark runs
  * it with map-side partial aggregation: the shuffle carries one
  * dim-length buffer per (partition, group), never per row — the property
  * that keeps a full-corpus centroid update at 100 TB to a k-row
  * exchange. Null and short vectors contribute only the elements they
  * have (accumulation is over the overlapping prefix).
  */
class VectorSum(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](dim)

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v != null) {
      val n = math.min(buf.length, v.length)
      var i = 0
      while (i < n) { buf(i) += v(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = VectorSum.arrayDouble
  override def outputEncoder: Encoder[Seq[Double]] = VectorSum.seqDouble
}

private[functions] object VectorSum {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val seqDouble: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
