package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass covariance-moment kernel: a typed `Aggregator` that reduces a
  * stream of embedding vectors to the exact integer moments a d×d
  * covariance matrix needs — n, the per-dimension sums, and the upper
  * triangle of the outer-product sum. Inputs are FIXED-POINT (each
  * component pre-scaled to a long, see `stats_covariance`), so every sum
  * is an exact integer: partial buffers merge associatively with no
  * float-order sensitivity, and the DuckDB oracle reproduces the numbers
  * bit-for-bit from the same scaled values.
  *
  * This is the 100 TB shape for covariance/PCA-style statistics: ONE
  * narrow pass over the data with a fixed d(d+3)/2+1-long buffer
  * (d=64 → ~2 k longs ≈ 17 KB) that map-side combines like any built-in
  * agg — versus the explode-to-(i,j)-pairs formulation, which inflates
  * every row d²/2× before the partial aggregate sees it. The d×d result
  * is metadata-scale and post-processed declaratively.
  */
object CovSums {

  /** Upper-triangle flat index for (i, j), i <= j, over dimension d. */
  def triIndex(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  final case class Buf(var n: Long, s: Array[Long], ss: Array[Long])

  /** Output: (n, per-dim sums, upper-triangle cross-product sums). */
  final case class Moments(n: Long, s: Array[Long], ss: Array[Long])

  final class CovSumsAggregator(dim: Int)
      extends Aggregator[Array[Long], Buf, Moments] {
    private val triLen = dim * (dim + 1) / 2
    override def zero: Buf = Buf(0L, new Array[Long](dim), new Array[Long](triLen))
    override def reduce(b: Buf, q: Array[Long]): Buf = {
      var i = 0
      var k = 0
      while (i < dim) {
        val qi = q(i)
        b.s(i) += qi
        var j = i
        while (j < dim) { b.ss(k) += qi * q(j); j += 1; k += 1 }
        i += 1
      }
      b.n += 1
      b
    }
    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.s(i) += y.s(i); i += 1 }
      var k = 0
      while (k < triLen) { x.ss(k) += y.ss(k); k += 1 }
      x.n += y.n
      x
    }
    override def finish(b: Buf): Moments = Moments(b.n, b.s, b.ss)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }
}
