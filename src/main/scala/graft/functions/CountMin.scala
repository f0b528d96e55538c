package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan) as a typed `Aggregator`:
  * the mergeable frequency sketch that answers "how often did key k
  * appear" within additive error ε·N (one-sided — CMS only ever
  * OVER-estimates) from a fixed depth×width grid of counters, regardless
  * of key cardinality. The complement of the exact Misra-Gries path
  * (`agg_heavy_hitters`): MG answers top-k exactly but must track
  * candidates; CMS answers point queries for ANY key from O(1) state per
  * partition and merges by plain counter addition — the shape that
  * pre-aggregates per hour/day and rolls up like the HLL rollup.
  *
  * Rows hash with the house Knuth-multiplicative family over a prime
  * modulus, seeded per row with fixed odd multipliers — fully
  * deterministic, so the sketch (and every estimate) is bit-identical
  * across partitionings and engines; the DuckDB oracle gates estimates
  * against exact counts with the ε·N bound.
  */
object CountMin {

  val Depth = 4
  val Width = 512
  private val Prime = 1000000007L
  /** Fixed odd multipliers, one hash row each. */
  private val Mults = Array(2654435761L, 2246822519L, 3266489917L, 668265263L)

  /** Column index of `key` in hash row `r`. */
  def slot(key: Long, r: Int): Int =
    ((((key % Prime) + Prime) % Prime * Mults(r)) % Prime % Width).toInt

  final case class Buf(var n: Long, counters: Array[Long])

  final class CmsAggregator extends Aggregator[Long, Buf, Buf] {
    override def zero: Buf = Buf(0L, new Array[Long](Depth * Width))
    override def reduce(b: Buf, key: Long): Buf = {
      var r = 0
      while (r < Depth) { b.counters(r * Width + slot(key, r)) += 1L; r += 1 }
      b.n += 1
      b
    }
    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < Depth * Width) { x.counters(i) += y.counters(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Point-query the finished sketch: min over the key's row counters. */
  def estimate(sketch: Buf, key: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = sketch.counters(r * Width + slot(key, r))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** The same point query as a native Column expression over the sketch's
    * `counters` array — declared arithmetic, so probing N keys against a
    * broadcast sketch stays inside whole-stage codegen (no UDF). MUST
    * mirror [[slot]] exactly; the spec pins the two against each other. */
  def estimateColumn(counters: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until Depth).map { r =>
      val s = pmod(pmod(pmod(key, lit(Prime)) * lit(Mults(r)), lit(Prime)), lit(Width))
      element_at(counters, (lit(r * Width) + s).cast("int") + 1)
    }.reduce(least(_, _))
  }
}
