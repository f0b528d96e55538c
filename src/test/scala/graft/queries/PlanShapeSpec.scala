package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape regression guards: the properties that make these queries
  * scale must survive refactors — pushed filters, broadcast dim joins,
  * single-stage narrow pipelines, TakeOrdered top-k. Assertions are kept
  * loose (substring-level) so Spark-version plan cosmetics don't break
  * them. */
class PlanShapeSpec extends SparkSpec {

  private def explained(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)

  test("q1: shipdate predicate reaches the parquet scan") {
    val plan = explained("q1_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
  }

  test("q1: scan is column-pruned to the referenced columns") {
    val plan = explained("q1_pricing_summary")
    assert(!plan.contains("l_orderkey"), s"q1 must not read join keys it never uses:\n$plan")
  }

  test("q3: both dimension joins broadcast") {
    val plan = explained("q3_top_orders")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, plan)
  }

  test("etl_pipeline: narrow plan — the only exchange is the deterministic output sort") {
    val plan = explained("etl_pipeline")
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("etl_pipeline: zero UDFs — everything is native expressions") {
    val plan = explained("etl_pipeline")
    assert(!plan.toLowerCase.contains("udf"), plan)
  }

  test("topk_orders: global limit plans as TakeOrdered, not a global sort") {
    val plan = explained("topk_orders")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("join_semi/anti plan as semi/anti hash joins") {
    assert(explained("join_semi").contains("LeftSemi"), explained("join_semi"))
    assert(explained("join_anti").contains("LeftAnti"), explained("join_anti"))
  }

  test("q4: EXISTS plans as a left-semi join with the quarter filter pushed") {
    val plan = explained("q4_order_priority")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), plan)
  }

  test("q3: segment filter pushed to the customer scan; top-k plans as TakeOrdered") {
    val plan = explained("q3_top_orders")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q5: four dims broadcast; order-date range pushed to the orders scan") {
    val plan = explained("q5_nation_revenue")
    // >= 4: the four explicitly-broadcast dims; the tiny sf0.001 orders
    // side may auto-broadcast as a fifth, which at scale it would not
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan)
    assert(plan.contains("LessThan(o_orderdate"), plan)
  }

  test("funnel: stacked windows + per-user agg reuse ONE user_id exchange") {
    val plan = explained("events_funnel")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
  }

  test("q14: part dim is broadcast; month filter reaches the lineitem scan") {
    val plan = explained("q14_promo_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
  }

  test("q10: returnflag filter pushed to the lineitem scan; top-20 plans as TakeOrdered") {
    val plan = explained("q10_returned_items")
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q21: EXISTS/NOT EXISTS chain plans as one semi + one anti join") {
    val plan = explained("q21_waiting_supplier")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q15: scalar-max join broadcasts; no nested-loop over the revenue view") {
    val plan = explained("q15_top_supplier")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q18: HAVING subquery plans as a semi join against the aggregated keys") {
    val plan = explained("q18_large_orders")
    assert(plan.contains("LeftSemi"), plan)
  }

  test("hot paths stay inside whole-stage codegen (no interpreted fallback)") {
    Seq("q1_pricing_summary", "etl_pipeline", "sql_vector_dot").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      df.collect() // materialize so AQE reports the FINAL plan with codegen ids
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // under AQE the formatted final plan tags each fused operator with
      // its whole-stage codegen stage id; scans/aggregates/projects of the
      // hot path must carry one
      assert(plan.contains("[codegen id :"), s"$name lost codegen:\n$plan")
    }
  }

  test("q22: scalar subquery broadcasts (no collect); NOT EXISTS plans as anti join") {
    val plan = explained("q22_dormant_customers")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
