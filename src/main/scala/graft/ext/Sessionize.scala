package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (TESTDATA.md), batch
  * form; [[graft.streaming.StreamingOps]] carries the Structured Streaming
  * twins. All window shapes shuffle once on `user_id` (sessionize) or on
  * the group key (windowed aggs) — the standard scalable layouts.
  */
object Sessionize {

  /** Gap-based sessionization: a >`gapMinutes` silence starts a new
    * session. Classic lag → flag → running-sum-as-session-index, all inside
    * one `user_id` window partition (single shuffle; at 100 TB this is the
    * canonical "shuffle once by entity, sort within" layout).
    * Emits one row per session with stats. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    val flagged = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(col("us") - lag("us", 1).over(wOrd) > gapUs, 1).otherwise(0))
      .withColumn("sess_idx",
        sum("new_sess").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "sess_idx")
      .agg(
        count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("duration_us"),
        round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("sess_idx"), col("n_events"),
        (col("duration_us") / 1000000.0).as("duration_s"), col("total_value"))
      .orderBy("user_id", "sess_idx")
  }

  /** Tumbling-window aggregation via Spark's `window()` (1-hour buckets). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Sliding-window aggregation (1-hour windows every 15 minutes): each
    * event lands in 4 windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")

  /** Semi-structured props: pull the numeric `k` field with a regex (kept
    * regex-based so the DuckDB twin needs no JSON extension) and aggregate
    * per event type. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).try_cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
}
