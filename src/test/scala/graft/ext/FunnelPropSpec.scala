package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** The one-shuffle window funnel must agree with the straightforward
  * 3-round conditional-aggregation form (the shape the DuckDB oracle
  * expresses) on arbitrary event streams — including ties, missing steps,
  * out-of-order steps, and duplicate timestamps. */
class FunnelPropSpec extends SparkSpec {

  /** Direct 3-shuffle transliteration of the funnel semantics. */
  private def referenceFunnel(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = base.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("v_us"))
    val c = base.join(v, "user_id")
      .groupBy("user_id", "v_us")
      .agg(min(when(col("event_type") === "click" && col("us") > col("v_us"), col("us"))).as("c_us"))
    val p = base.join(c, "user_id")
      .groupBy("user_id", "v_us", "c_us")
      .agg(min(when(col("event_type") === "purchase" && col("us") > col("c_us"), col("us"))).as("p_us"))
    p.agg(
      count(lit(1)).as("n_users"),
      count(col("v_us")).as("n_view"),
      count(col("c_us")).as("n_view_click"),
      count(col("p_us")).as("n_full_funnel"))
  }

  private val eventGen = for {
    user <- Gen.choose(0L, 11L)
    typ <- Gen.oneOf("view", "click", "purchase", "other")
    // tiny timestamp domain → frequent exact ties, the adversarial case
    us <- Gen.choose(0L, 19L)
  } yield (user, typ, us)

  test("window funnel ≡ 3-round aggregation funnel on 40 arbitrary event sets") {
    import spark.implicits._
    (1 to 40).foreach { i =>
      val rows = Gen.listOfN(60, eventGen).sample.get
      val events = rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"), timestamp_micros(col("us")).as("ts"))
      val got = Analytics.funnel(events).collect().toSeq
      val want = referenceFunnel(events).collect().toSeq
      assert(got == want, s"funnel divergence on case $i:\n${rows.mkString("\n")}")
    }
  }

  /** 3-round transliteration of the CONVERSION-WINDOW semantics (the
    * oracle's shape): each step must land within `gap` of the previous. */
  private def referenceFunnelWindowed(events: DataFrame, gap: Long): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = base.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("v_us"))
    val c = base.join(v, "user_id")
      .groupBy("user_id", "v_us")
      .agg(min(when(col("event_type") === "click" && col("us") > col("v_us") &&
        col("us") <= col("v_us") + gap, col("us"))).as("c_us"))
    val p = base.join(c, "user_id")
      .groupBy("user_id", "v_us", "c_us")
      .agg(min(when(col("event_type") === "purchase" && col("us") > col("c_us") &&
        col("us") <= col("c_us") + gap, col("us"))).as("p_us"))
    p.agg(
      count(lit(1)).as("n_users"),
      count(col("v_us")).as("n_view"),
      count(col("c_us")).as("n_view_click"),
      count(col("p_us")).as("n_full_funnel"))
  }

  test("windowed funnel ≡ 3-round form with gap bounds on 40 arbitrary event sets") {
    import spark.implicits._
    // gap 5 on a 0..19 timestamp domain — the bound prunes constantly,
    // including the step-lands-exactly-on-the-bound tie
    (1 to 40).foreach { i =>
      val rows = Gen.listOfN(60, eventGen).sample.get
      val events = rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"), timestamp_micros(col("us")).as("ts"))
      val got = Analytics.funnelWindowed(events, maxGapUs = 5L).collect().toSeq
      val want = referenceFunnelWindowed(events, gap = 5L).collect().toSeq
      assert(got == want, s"windowed-funnel divergence on case $i:\n${rows.mkString("\n")}")
    }
  }

  test("pattern match: hand-built sequences count matches exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_patfix").toString
    def t(us: Long) = new java.sql.Timestamp(us / 1000)
    // u1: v c p           → vcp:1, v[ces]*p:1, e{2,}:0
    // u2: v e e p v c p   → vcp:1, v[ces]*p:2, e{2,}:1
    // u3: e e e           → e{2,}:1 (non-overlapping greedy = one run)
    val rows = Seq(
      (1L, 1L, "view", t(1000000)), (1L, 2L, "click", t(2000000)), (1L, 3L, "purchase", t(3000000)),
      (2L, 4L, "view", t(1000000)), (2L, 5L, "error", t(2000000)), (2L, 6L, "error", t(3000000)),
      (2L, 7L, "purchase", t(4000000)), (2L, 8L, "view", t(5000000)), (2L, 9L, "click", t(6000000)),
      (2L, 10L, "purchase", t(7000000)),
      (3L, 11L, "error", t(1000000)), (3L, 12L, "error", t(2000000)), (3L, 13L, "error", t(3000000)))
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("events_pattern_match")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("vcp") == ((2L, 2L)), s"got $got")
    assert(got("v[ces]*p") == ((3L, 2L)), s"got $got")
    assert(got("e{2,}") == ((2L, 2L)), s"got $got")
  }

  test("windowed funnel: expired windows drop conversions the unbounded funnel keeps") {
    import spark.implicits._
    // u1: view@0 → click@10 (in window) → purchase@45 (35 past the click — out)
    // u2: view@0 → click@40 (40 past the view — out)
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 45L),
      (2L, "view", 0L), (2L, "click", 40L))
    val events = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"), timestamp_micros(col("us")).as("ts"))
    val bounded = Analytics.funnelWindowed(events, maxGapUs = 30L).collect().head
    assert(bounded.getAs[Long]("n_view") == 2L)
    assert(bounded.getAs[Long]("n_view_click") == 1L) // u2's click expired
    assert(bounded.getAs[Long]("n_full_funnel") == 0L) // u1's purchase expired
    val unbounded = Analytics.funnel(events).collect().head
    assert(unbounded.getAs[Long]("n_view_click") == 2L)
    assert(unbounded.getAs[Long]("n_full_funnel") == 1L)
  }
}
