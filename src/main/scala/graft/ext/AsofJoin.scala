package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the most recent right row at or before
  * it" — via the scalable union+window formulation: tag both sides, union,
  * ONE shuffle on the join key, sort within partition by time, then
  * `last_value(..., ignoreNulls)` carries the latest right-side attributes
  * forward onto each left row. This is the shape that survives 100 TB —
  * no per-row range probing, no broadcast requirement, skew handled by AQE
  * on the single key shuffle. (Spark has no native as-of operator; a
  * custom `SparkStrategy` could fuse the sort, but the union+window plan
  * already collapses to exactly one Exchange + one Sort — nothing left to
  * win.) */
object AsofJoin {

  /** For each `purchase` event: the most recent strictly-earlier event of
    * the same user (any type), with its type and timestamp. Deterministic:
    * right-side order is (ts, event_id). */
  def lastEventBeforePurchase(events: DataFrame): DataFrame = {
    val tagged = events.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("prev_event_id", last("event_id", ignoreNulls = true).over(w))
      .withColumn("prev_event_type", last("event_type", ignoreNulls = true).over(w))
      .withColumn("prev_ts", last("ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("prev_event_id"), col("prev_event_type"),
        unix_micros(col("prev_ts")).as("prev_us"))
      .orderBy("event_id")
  }

  /** Candidate columns for the tolerance-bounded NEAREST as-of join
    * (pandas `merge_asof(direction='nearest', tolerance=...)`): each
    * purchase row annotated with the closest 'view' on EACH side — the
    * latest at-or-before (prev_*) and the earliest strictly-after
    * (next_*). The two frames (backward `last`, forward `first`) share
    * one partition+sort, so the plan stays exactly one Exchange + one
    * Sort, same as [[lastEventBeforePurchase]] — adding the forward
    * direction costs no extra shuffle. The pick-nearest-within-tolerance
    * rule is a final row-local CASE the caller applies (shared verbatim
    * with the DuckDB oracle). */
  def nearestViewCandidates(events: DataFrame): DataFrame = {
    val isView = col("event_type") === "view"
    val viewId = when(isView, col("event_id"))
    val viewUs = when(isView, unix_micros(col("ts")))
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wb = order.rowsBetween(Window.unboundedPreceding, -1)
    val wf = order.rowsBetween(1, Window.unboundedFollowing)
    events
      .withColumn("p_us", unix_micros(col("ts")))
      .withColumn("prev_id", last(viewId, ignoreNulls = true).over(wb))
      .withColumn("prev_us", last(viewUs, ignoreNulls = true).over(wb))
      .withColumn("next_id", first(viewId, ignoreNulls = true).over(wf))
      .withColumn("next_us", first(viewUs, ignoreNulls = true).over(wf))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "p_us",
        "prev_id", "prev_us", "next_id", "next_us")
  }

  /** Range join: events within `windowMinutes` AFTER each purchase of the
    * same user. Equi-key (user_id) + range predicate → sort-merge join
    * with a band condition, one shuffle per side. */
  def followUpsWithin(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val e = events
      .select(col("user_id"), col("event_id").as("f_id"), unix_micros(col("ts")).as("f_us"))
    p.join(e, Seq("user_id"))
      .filter(col("f_us") > col("p_us") && col("f_us") <= col("p_us") + lit(winUs))
      .groupBy("p_id")
      .agg(count(lit(1)).as("n_followups"), min("f_id").as("first_follow_id"))
      .orderBy("p_id")
  }
}
