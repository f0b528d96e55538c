package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Registry.table

/** Relational surface (SURVEY.md §2.4-2.7, §7.2 M2): the join / aggregation /
  * window / sort / set-op capabilities a Spark engine exposes for free via
  * Catalyst, registered as oracle-checked queries over the TPC-H-ish tables.
  * The reference itself has none of these (SURVEY.md §2.4-§2.6) — they are
  * the capability extension mandated by BASELINE.json's north star.
  */
object RelationalQueries {

  val all: Map[String, Q] = Map(
    // TPC-H Q1 shape: map-side partial aggregation, one shuffle on the
    // 6-value group key; at 100 TB the partial agg reduces shuffle volume by
    // ~rows/6 so this stays network-trivial.
    "q1_pricing_summary" -> Q(
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1-shaped grouped aggregation over lineitem")
  )
}
