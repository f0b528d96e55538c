package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Approximate aggregates can't be oracle-compared across engines
  * (different sketches), so their error bounds are pinned here instead. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val li = table(spark, sf("sf0.01"), "lineitem")
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey").as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within 2% of exact percentile") {
    val o = table(spark, sf("sf0.01"), "orders")
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
