package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout key: interleave the bits of two
  * clustering dimensions so that range-partitioning + sorting on ONE
  * derived column co-locates rows that are close in BOTH dimensions.
  *
  * Why this matters at 100 TB: parquet/ORC min-max page statistics prune
  * on the *physical* row order. Sorting on a single column makes its
  * sibling dimensions uniformly smeared across every file, so a filter on
  * the second column skips nothing. A Z-ordered layout bounds BOTH
  * dimensions' min-max range per file (each Z-curve bucket is a quadrant
  * of the key space), so selective filters on either column prune most of
  * the scan — the standard data-skipping layout in Delta/Iceberg
  * `OPTIMIZE ZORDER BY`.
  *
  * The interleave itself is the classic magic-number bit spread —
  * five shift/mask steps per dimension, pure integer ops, whole-stage
  * codegen'd, and expressible verbatim in ANSI SQL for the oracle
  * (DuckDB's `&`/`|`/`<<` have identical BIGINT semantics).
  *
  * `bits = 16` interleaves two 16-bit dimensions into a 32-bit key. At
  * cluster scale the same construction extends to 21 bits × 3 dims into a
  * 63-bit key; dimension values wider than `bits` must be range-bucketed
  * (quantile-binned) first — masking here is only safe when the caller
  * guarantees the domain, which the registered query does.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value: abcd… → a0b0c0d0…. Five shift-or-mask rounds. */
  def spread16(v: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL),
      (4, 0x0F0F0F0FL),
      (2, 0x33333333L),
      (1, 0x55555555L))
    m.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of two dimensions, each masked to 16 bits:
    * z = spread(x) | (spread(y) << 1). Monotone in the Z-curve order. */
  def zvalue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as [[spread16]] in DuckDB SQL, for oracle parity. */
  def spread16Sql(v: String): String = {
    val masked = s"($v & 65535)"
    val r1 = s"(($masked | ($masked << 8)) & 16711935)"
    val r2 = s"(($r1 | ($r1 << 4)) & 252645135)"
    val r3 = s"(($r2 | ($r2 << 2)) & 858993459)"
    s"(($r3 | ($r3 << 1)) & 1431655765)"
  }

  def zvalue16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Physically Z-order `df`: range-partition on the Morton key (so files
    * are disjoint Z-ranges — each a bounded quadrant in both dims) and
    * sort within partitions (so page-level stats are tight too). This is
    * the write-side layout operator; the read side needs nothing — plain
    * min-max pruning does the skipping. */
  def layout(df: DataFrame, x: String, y: String, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zvalue16(col(x), col(y)))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
