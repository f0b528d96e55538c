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
}
