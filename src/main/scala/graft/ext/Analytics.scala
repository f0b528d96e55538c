package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` table: ordered funnel
  * conversion, cohort retention, and date-spine gap filling with forward
  * fill. Each is the standard scalable layout — per-entity aggregation on
  * one key shuffle, spine generation via `sequence`/explode rather than a
  * driver loop. */
object Analytics {

  /** Ordered funnel view → click → purchase: a step counts only when it
    * happens strictly AFTER the previous step's first occurrence.
    *
    * ONE shuffle on user_id: a single time-ordered window pass carries a
    * running first-view min; a click qualifies when that running min is
    * strictly below its timestamp (⇔ `us > first_view` — the strict
    * compare makes tie order irrelevant), and a second stacked running
    * min over qualified clicks gates purchases the same way. The stacked
    * window + per-user aggregate all reuse the same hash partitioning, so
    * the plan has exactly one user_id Exchange (was 3 groupBy→join
    * rounds), then the single-row summary. */
  def funnel(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = base
      .withColumn("rv", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("qc",
        when(col("event_type") === "click" && col("rv") < col("us"), col("us")))
      .withColumn("rc", min(col("qc")).over(w))
    flagged.groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("us"))).as("v_us"),
        min(col("qc")).as("c_us"),
        min(when(col("event_type") === "purchase" && col("rc") < col("us"), col("us"))).as("p_us"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("v_us")).as("n_view"),
        count(col("c_us")).as("n_view_click"),
        count(col("p_us")).as("n_full_funnel"))
  }

  /** Time-constrained funnel: same first-view → first-qualifying-click →
    * first-qualifying-purchase fold as [[funnel]], but each step must land
    * within `maxGapUs` of the previous step's timestamp — the conversion-
    * window semantics every product-analytics funnel defaults to (an
    * unbounded funnel credits a purchase months after the click). Same
    * single user-keyed window pass; the gap predicate is per-row
    * arithmetic, so the plan (one Exchange on user_id) is unchanged. */
  def funnelWindowed(events: DataFrame, maxGapUs: Long): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = base
      .withColumn("rv", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("qc",
        when(col("event_type") === "click" && col("rv") < col("us") &&
          col("us") <= col("rv") + maxGapUs, col("us")))
      .withColumn("rc", min(col("qc")).over(w))
    flagged.groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("us"))).as("v_us"),
        min(col("qc")).as("c_us"),
        min(when(col("event_type") === "purchase" && col("rc") < col("us") &&
          col("us") <= col("rc") + maxGapUs, col("us"))).as("p_us"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("v_us")).as("n_view"),
        count(col("c_us")).as("n_view_click"),
        count(col("p_us")).as("n_full_funnel"))
  }

  /** Cohort retention: users grouped by first-seen day; for each cohort ×
    * day-offset, how many distinct users were active. */
  def cohortRetention(events: DataFrame, maxOffset: Int = 7): DataFrame = {
    val activity = events
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min("d").as("cohort_d"))
    activity.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_d")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_d", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_d", "day_offset")
  }

  /** Hourly revenue per event type over a complete hour spine (generated
    * with `sequence` + explode — no driver loop), missing cells forward-
    * filled from the last observed value within the type. */
  def gapFillForwardFill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(round(sum("value"), 2).as("rev"))
    val bounds = events.agg(
      date_trunc("hour", min("ts")).as("h0"), date_trunc("hour", max("ts")).as("h1"))
    val spine = bounds
      .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(events.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("h", "event_type"), "left_outer")
      .withColumn("rev_filled", coalesce(col("rev"), last("rev", ignoreNulls = true).over(w), lit(0.0)))
      .select(col("h"), col("event_type"), col("rev_filled"))
      .orderBy("h", "event_type")
  }

  /** Reliability diagram + expected calibration error over a scored,
    * binary-labeled frame ("id", "score" ∈ [0,1], "label" ∈ {0,1}) — the
    * model-eval every learned curation filter needs before its threshold
    * is trusted at corpus scale. Ten equal-width confidence bins (bin 9
    * absorbs score = 1.0); per bin: population, mean confidence and
    * positive rate in exact MICRO-UNITS (scores enter as
    * round(score·10⁶) BIGINTs, so every mean is integer division —
    * bit-identical cross-engine, no floating accumulation), and the
    * |conf − acc| gap. The trailing bin = −1 row is the corpus rollup
    * whose gap column is the population-weighted ECE. Plan: one
    * combinable 10-ary groupBy; the rollup re-aggregates the 10-row
    * result — nothing after the first agg scales with data. */
  def calibrationReport(scored: DataFrame): DataFrame = {
    val perBin = scored
      .select(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"),
        round(col("score") * 1000000).cast("long").as("score6"),
        col("label").cast("long").as("label"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("score6").as("cs"),
        sum("label").as("np"))
      .select(col("bin"), col("n"),
        expr("cs div n").as("conf6"),
        expr("(np * 1000000) div n").as("acc6"))
      .withColumn("gap6", abs(col("conf6") - col("acc6")))
    val total = perBin
      .groupBy(lit(-1L).as("bin"))
      .agg(sum("n").as("n"),
        expr("sum(conf6 * n) div sum(n)").as("conf6"),
        expr("sum(acc6 * n) div sum(n)").as("acc6"),
        expr("sum(gap6 * n) div sum(n)").as("gap6"))
    perBin.unionByName(total).orderBy("bin")
  }
}
