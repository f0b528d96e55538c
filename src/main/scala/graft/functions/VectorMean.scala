package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise mean of embedding vectors
  * (a centroid) — the custom-aggregate extension point (SURVEY.md §2.9:
  * `Aggregator[IN, BUF, OUT]` for kernels beyond the built-in sketches).
  * Partial buffers merge associatively, so Spark runs it with map-side
  * partial aggregation like any built-in agg; the buffer is a fixed
  * `dim+1` doubles regardless of group size — O(1) state, 100 TB-safe.
  *
  * Feeds IVF: per-label centroids are exactly the k-means update step for
  * [[graft.ext.Similarity.assignClusters]].
  */
object VectorMean {

  final case class Buf(sums: Array[Double], var n: Long)

  final class VectorMeanAggregator(dim: Int)
      extends Aggregator[Array[Float], Buf, Array[Double]] {
    override def zero: Buf = Buf(new Array[Double](dim), 0L)
    override def reduce(b: Buf, a: Array[Float]): Buf = {
      var i = 0
      while (i < dim && i < a.length) { b.sums(i) += a(i).toDouble; i += 1 }
      b.n += 1
      b
    }
    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(b: Buf): Array[Double] =
      if (b.n == 0) b.sums else b.sums.map(_ / b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
