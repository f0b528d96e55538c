package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The house two-level distributed prefix sum — ONE implementation of the
  * rank/cumsum machinery `stats_kstest`, `stats_mannwhitney`,
  * `stats_spearman`, `events_user_concentration`, and `pack_sequences`
  * previously each hand-rolled (bucket sizing, broadcast range-join
  * offsets, bucket-partitioned intra-cumsum, tie handling, empty-input
  * guard). A plain running-sum window serializes each group through one
  * task (a 100 TB scale-killer); here rows land in `nBuckets` fixed
  * ranges of the order column, per-bucket totals become starting offsets
  * via a broadcast theta-join over the bounded totals frame (groups ×
  * nBuckets rows at ANY data size — window-free at the top level), and
  * the intra-bucket cumsum runs under a bucket-PARTITIONED window.
  * Identical to the global running sum because the bucket map is
  * monotone in the order column; parallelism is groups × buckets.
  * Pinned ≡ an unpartitioned-window reference on arbitrary weighted
  * multisets by PrefixSumPropSpec. */
object PrefixSum {

  /** Appends `cum_<w>` — the INCLUSIVE running sum of each `weightCols`
    * column over rows ordered by `orderCol` within each `partitionCols`
    * group. Contract: `orderCol` is numeric, UNIQUE per group (histogram
    * values / unique ids — duplicates would make the intra-bucket row
    * frame tie-order-dependent), and double-exact (|v| < 2^52); weights
    * are integral (offsets null-fill `0L`). `bounds` = caller-probed
    * (lo, hi) of `orderCol` (any CONTAINING range is valid — bucketing
    * affects the plan, never the output); None → self-probe on `df`. */
  def cumulative(
      df: DataFrame,
      orderCol: String,
      weightCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      bounds: Option[(Double, Double)] = None,
      nBuckets: Int = 1024): DataFrame = {
    require(weightCols.nonEmpty, "cumulative: need at least one weight column")
    val (lo, hi) = bounds.getOrElse {
      val r = df.agg(min(col(orderCol)).cast("double"),
        max(col(orderCol)).cast("double")).collect()(0)
      def b(i: Int): Double =
        Option(r.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      (b(0), b(1))
    }
    // span ≥ 1 keeps bucket ids bounded by ~nBuckets (for huge ranges,
    // hi-lo ≳ 2^53, the +1.0 is absorbed by rounding and v=hi can land in
    // an overflow bucket == nBuckets — harmless, it's just one more
    // bucket); double mul/div by positive constants is monotone under
    // round-to-nearest, so bucket order agrees with value order (the
    // only correctness requirement)
    val span = math.max(1.0, hi - lo + 1.0)
    val bk = df.withColumn("__ps_bucket",
      floor((col(orderCol).cast("double") - lit(lo)) * nBuckets / lit(span))
        .cast("long"))
    val keyCols = partitionCols :+ "__ps_bucket"
    val totAggs = weightCols.map(w => sum(col(w)).as(s"__ps_t_$w"))
    val totals = bk.groupBy(keyCols.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val thetaCond = partitionCols
      .map(c => col(s"x.$c") === col(s"y.$c"))
      .foldLeft[Column](col("y.__ps_bucket") < col("x.__ps_bucket"))(_ && _)
    val offAggs = weightCols.map(w =>
      coalesce(sum(col(s"y.__ps_t_$w")), lit(0L)).as(s"__ps_o_$w"))
    val offsets = totals.as("x")
      .join(broadcast(totals.as("y")), thetaCond, "left")
      .groupBy(keyCols.map(c => col(s"x.$c").as(c)): _*)
      .agg(offAggs.head, offAggs.tail: _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cummed = weightCols.foldLeft(bk.join(broadcast(offsets), keyCols)) {
      case (d, wc) => d.withColumn(s"cum_$wc",
        col(s"__ps_o_$wc") + sum(col(wc)).over(w))
    }
    cummed.drop("__ps_bucket" +: weightCols.map(w => s"__ps_o_$w"): _*)
  }

  /** The shared one-row scalar probe behind [[cumulative]]'s `bounds`:
    * max of a (numeric) column, usually against the cheaper
    * pre-histogram base table; null max (empty input) → 0. Extracted
    * because every histogram call site hand-rolled the same
    * collect/Option/cast dance. */
  def maxBound(df: DataFrame, c: String): Double =
    Option(df.agg(max(col(c)).cast("double")).collect()(0).get(0))
      .map(_.asInstanceOf[Double]).getOrElse(0.0)

  /** 2× the average rank of each row's `orderCol` value in the weighted
    * multiset where the row counts `weightCol` times — the exact-integer
    * tie encoding (2·cum_before + cnt + 1; .5 average ranks stay
    * integral) the rank statistics share. Appends `r2` + `cum_<w>`. */
  def rank2(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      bounds: Option[(Double, Double)] = None,
      nBuckets: Int = 1024): DataFrame =
    cumulative(df, orderCol, Seq(weightCol), Nil, bounds, nBuckets)
      .withColumn("r2",
        lit(2L) * (col(s"cum_$weightCol") - col(weightCol))
          + col(weightCol) + 1L)
}
