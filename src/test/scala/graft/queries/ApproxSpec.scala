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

  test("agg_approx_distinct: every per-group HLL estimate within 5% of exact") {
    // same bound the DuckDB oracle gates for the registered query
    val o = table(spark, sf("sf0.01"), "orders")
    o.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .collect().foreach { r =>
        val (exact, approx) = (r.getLong(1), r.getLong(2))
        assert(math.abs(approx - exact).toDouble <= 0.05 * exact,
          s"group=${r.getString(0)} approx=$approx exact=$exact")
      }
  }

  test("approx_percentile within 2% of exact percentile") {
    val o = table(spark, sf("sf0.01"), "orders")
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("agg_percentiles_approx: every per-group sketch value within 2% of exact") {
    // same bound the DuckDB oracle gates for the registered query — pinned
    // here in-engine so a sketch-accuracy regression fails fast in CI, not
    // only at driver-verify time
    val o = table(spark, sf("sf0.01"), "orders")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val aggs = ps.flatMap { p =>
      Seq(expr(s"percentile(o_totalprice, $p)").as(s"e$p"),
        expr(s"approx_percentile(o_totalprice, $p, 10000)").as(s"a$p"))
    }
    o.groupBy("o_orderstatus").agg(aggs.head, aggs.tail: _*).collect().foreach { r =>
      ps.zipWithIndex.foreach { case (p, i) =>
        val (exact, approx) = (r.getDouble(1 + 2 * i), r.getDouble(2 + 2 * i))
        assert(math.abs(approx - exact) <= 0.02 * exact,
          s"group=${r.getString(0)} p=$p approx=$approx exact=$exact")
      }
    }
  }
}
