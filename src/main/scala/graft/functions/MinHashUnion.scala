package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate merging per-document MinHash signatures into one
  * corpus-level signature by element-wise minimum.
  *
  * The union property of MinHash: min-merging the signatures of a set of
  * documents yields exactly the signature of the union of their shingle
  * sets, so two corpus signatures estimate the Jaccard similarity of the
  * corpora the same way two document signatures do — without re-reading
  * any document. Decomposable (reduce/merge associative + commutative),
  * so Spark runs it with map-side partial aggregation.
  */
class MinHashUnion(numHashes: Int)
  extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      val n = math.min(buf.length, sig.length)
      var i = 0
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoderHelper.seqLong
}

private[functions] object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayLong: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  val seqLong: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
