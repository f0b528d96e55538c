package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Registry.table

/** Relational surface (SURVEY.md §2.4-2.7, §7.2 M2): the join / aggregation /
  * window / sort / set-op capabilities a Spark engine exposes via Catalyst,
  * registered as oracle-checked queries over the TPC-H-ish tables. The
  * reference itself has none of these (SURVEY.md §2.4-§2.6) — they are the
  * capability extension mandated by BASELINE.json's north star.
  *
  * Scale notes are per-query; the shared posture: aggregations rely on
  * map-side partial agg, dimension joins are explicitly `broadcast()`, fact-
  * fact joins shuffle on their join key once and AQE coalesces/skew-splits at
  * runtime, top-k is TakeOrdered (per-partition heap + driver merge of k).
  */
object RelationalQueries {

  val all: Map[String, Q] = Map(
    // ---------------------------------------------------------------- aggs
    // Map-side partial aggregation → one shuffle of ≤ (partitions × 6 groups)
    // rows. At 100 TB the shuffle stays KB-sized; scan dominates (and only
    // reads the 7 referenced columns of the parquet).
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
      "TPC-H Q1-shaped grouped aggregation over lineitem"),

    // TPC-H Q6 shape: pure filter + global sum — pushdown does all the work.
    "q6_revenue_change" -> Q(
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |  count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      "TPC-H Q6 shape: multi-predicate pushdown + global aggregate"),

    // TPC-H Q4 shape: EXISTS decorrelates to a left-semi join on the shuffle
    // key; the orders date filter is pushed to the scan so the semi join's
    // build side is one quarter of the fact, not the whole table.
    "q4_order_priority" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val l = table(s, dir, "lineitem")
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "TPC-H Q4 shape: EXISTS → left-semi join, priority counts"),

    // TPC-H Q13 shape: outer join so zero-order customers survive with
    // count 0, then a second (tiny) aggregation over the per-customer counts.
    // At scale: first agg shuffles on c_custkey; second agg's input is one
    // row per customer and its output ≤ distinct counts — KB-sized.
    "q13_cust_distribution" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").filter(col("o_orderstatus") =!= "F")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      "TPC-H Q13 shape: outer-join count distribution histogram"),

    // TPC-H Q14 shape: conditional aggregation over a broadcast dim join.
    // part is a dimension → broadcast; lineitem's month filter is pushed down.
    "q14_promo_revenue" -> Q(
      (s, dir) => {
        val l = table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        val p = table(s, dir, "part")
        val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0))) /
            sum(disc), 4).as("promo_revenue"))
      },
      Some("""SELECT round(100.0 *
             |    sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin),
      "TPC-H Q14 shape: conditional agg ratio over broadcast dim join"),

    // TPC-H Q16 shape (lineitem stands in for partsupp, which this dataset
    // lacks): distinct supplier count per part group. count(DISTINCT) over a
    // join shuffles (group keys, suppkey) once, dedups, then counts — Spark
    // plans exactly that expand/partial pipeline automatically.
    "q16_supplier_cnt" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#23" && col("p_size") < 10)
        val l = table(s, dir, "lineitem")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_size"))
      },
      Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM part JOIN lineitem ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#23' AND p_size < 10
             |GROUP BY p_brand, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),
      "TPC-H Q16 shape: distinct-count per group with exclusion filters"),

    // TPC-H Q18 shape: the IN subquery aggregates the fact first, so the
    // semi-join build side is only the qualifying order keys — a tiny set at
    // any scale (HAVING > 300 is highly selective), which AQE then broadcasts
    // into both the orders semi join and downstream joins.
    "q18_large_orders" -> Q(
      (s, dir) => {
        val l = table(s, dir, "lineitem")
        val big = l.groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 300)
          .select("l_orderkey")
        val o = table(s, dir, "orders")
          .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        val c = table(s, dir, "customer")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(l, col("o_orderkey") === l("l_orderkey"))
          .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
          .agg(sum("l_quantity").as("total_qty"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum(l_quantity) AS total_qty
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
             |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
             |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      "TPC-H Q18 shape: HAVING-subquery semi-join + grouped top-k"),

    // TPC-H Q22 shape (dormancy window stands in for the phone-prefix
    // predicate): scalar subquery → 1-row broadcast cross join (never a
    // collect), NOT EXISTS → left-anti join against the filtered orders.
    "q22_dormant_customers" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("avg_bal"))
        val recent = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey")
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "TPC-H Q22 shape: scalar subquery + anti-join dormant customers"),

    "agg_distinct" -> Q(
      (s, dir) => table(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(countDistinct("c_nationkey").as("n_nations"),
          count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
             |  count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "count-distinct + plain aggregates per group"),

    // ROLLUP/CUBE: grouping-set null markers are coalesced to 'ALL' on both
    // sides so output ordering never depends on engine null-ordering.
    "agg_rollup" -> Q(
      (s, dir) => table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin),
      "hierarchical grouping sets (ROLLUP)"),

    "agg_cube" -> Q(
      (s, dir) => table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin),
      "full cross-dimension grouping sets (CUBE)"),

    // --------------------------------------------------------------- joins
    // Fact-fact joins shuffle both sides on the key; the customer dim is
    // explicitly broadcast (at real TPC-H proportions customer ≪ lineitem).
    "q3_top_orders" -> Q(
      (s, dir) => {
        val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = table(s, dir, "orders")
        val l = table(s, dir, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      "TPC-H Q3 shape: 3-way join, grouped revenue, top-k"),

    "q5_nation_revenue" -> Q(
      (s, dir) => {
        val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = table(s, dir, "nation")
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val l = table(s, dir, "lineitem")
        val su = table(s, dir, "supplier")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      "TPC-H Q5 shape: 6-way join with broadcast dims"),

    "join_broadcast_dims" -> Q(
      (s, dir) => table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), round(avg("c_acctbal"), 2).as("avg_bal"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
             |  round(avg(c_acctbal), 2) AS avg_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
      "snowflake dim joins, broadcast on both hops"),

    // Semi/anti joins never materialize the right side's columns — the
    // scalable EXISTS / NOT EXISTS.
    "join_semi" -> Q(
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_with_orders"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_with_orders
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "left-semi join (EXISTS)"),

    // The right side is restricted to URGENT orders: in the synthetic
    // corpus every customer has at least one order, so an unrestricted
    // NOT EXISTS compares 0 = 0 and proves nothing. Against URGENT-only
    // orders the anti-join emits real rows at every SF (18 / 203 / 1986
    // customers at sf0.001/0.01/0.1) while staying a pure left-anti —
    // the restriction is a pushed-down filter on the build side, so the
    // at-scale plan shape (single equi-shuffle, no row explosion) is
    // unchanged.
    "join_anti" -> Q(
      (s, dir) => table(s, dir, "customer")
        .join(table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_without_urgent"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, count(*) AS n_without_urgent
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE c.c_custkey = o.o_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "left-anti join (NOT EXISTS, non-vacuous)"),

    "join_outer" -> Q(
      (s, dir) => {
        val perCust = table(s, dir, "orders")
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        table(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, coalesce(n_orders, 0) AS n_orders
             |FROM customer
             |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
             |           FROM orders GROUP BY o_custkey) po
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin),
      "left-outer join against a pre-aggregated side"),

    // ------------------------------------------------------------- windows
    "window_topk_per_group" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      "top-k per group via ranked window (scales as one shuffle on the partition key)"),

    // Running/lag/moving-average over a day-grained series. The daily
    // pre-aggregate is rounded first so the window inputs are identical
    // doubles on both engines; window sums then accumulate in ORDER BY
    // order → bit-identical results.
    "window_running" -> Q(
      (s, dir) => {
        val daily = table(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        // UNPARTITIONED window = all rows to ONE partition. Safe here only
        // because the input is a daily pre-aggregate (cardinality bounded
        // by the calendar, ~2.4k rows at any SF); NEVER copy this shape
        // onto an unbounded key — partition the window or bucket the time
        // axis instead.
        val w = Window.orderBy("d")
        daily
          .withColumn("running_rev",
            round(sum("rev").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .withColumn("prev_rev", lag("rev", 1).over(w))
          .withColumn("mov7_rev",
            round(avg("rev").over(w.rowsBetween(-6, Window.currentRow)), 2))
          .orderBy("d")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS d,
             |         round(sum(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY CAST(o_orderdate AS DATE))
             |SELECT d, rev,
             |  round(sum(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
             |  lag(rev, 1) OVER (ORDER BY d) AS prev_rev,
             |  round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS mov7_rev
             |FROM daily ORDER BY d""".stripMargin),
      "running sum, lag, 7-row moving average over a daily series"),

    // --------------------------------------------------------- sort / topk
    // ORDER BY + LIMIT plans as TakeOrdered: per-partition top-k heaps, then
    // a k-way driver merge — no global sort at any scale.
    "topk_orders" -> Q(
      (s, dir) => table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      "global top-k without global sort"),

    // ------------------------------------------------------------- set ops
    "set_ops" -> Q(
      (s, dir) => {
        val a = table(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = table(s, dir, "customer")
          .filter(col("c_acctbal") > 5000).select("c_custkey")
        a.union(b).distinct().withColumn("tag", lit("union"))
          .unionByName(a.intersect(b).withColumn("tag", lit("intersect")))
          .unionByName(a.except(b).withColumn("tag", lit("except")))
          .select("tag", "c_custkey")
          .orderBy("tag", "c_custkey")
      },
      Some("""WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
             |SELECT 'union' AS tag, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
             |UNION ALL
             |SELECT 'intersect', c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
             |UNION ALL
             |SELECT 'except', c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
             |ORDER BY tag, c_custkey""".stripMargin),
      "UNION / INTERSECT / EXCEPT (distinct semantics)"),

    // ------------------------------------------------- scalar fn coverage
    "string_funcs" -> Q(
      (s, dir) => table(s, dir, "part")
        .filter(col("p_partkey") % 7 === 0)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("upper_name"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 3).as("prefix3"),
          regexp_replace(col("p_name"), " ", "-").as("dashed"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          instr(col("p_name"), "e").cast("int").as("first_e"),
          translate(col("p_name"), "aeiou", "AEIOU").as("devoweled"),
          regexp_count(col("p_name"), lit("[aeiou]")).cast("int").as("n_vowels"),
          lpad(col("p_brand"), 12, "*").as("padded"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS upper_name,
             |  CAST(length(p_name) AS INTEGER) AS name_len,
             |  substring(p_name, 1, 3) AS prefix3,
             |  replace(p_name, ' ', '-') AS dashed,
             |  split_part(p_name, ' ', 1) AS first_word,
             |  p_brand || '|' || p_type AS brand_type,
             |  CAST(instr(p_name, 'e') AS INTEGER) AS first_e,
             |  translate(p_name, 'aeiou', 'AEIOU') AS devoweled,
             |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
             |  lpad(p_brand, 12, '*') AS padded
             |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin),
      "string function surface (SURVEY.md §2.7 equivalents)"),

    "date_funcs" -> Q(
      (s, dir) => table(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS yr,
             |  CAST(month(o_orderdate) AS INTEGER) AS mo,
             |  CAST(day(o_orderdate) AS INTEGER) AS dom,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |  CAST(o_orderdate AS DATE) + 30 AS plus30,
             |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
             |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin),
      "date/time function surface"),

    "case_tiers" -> Q(
      (s, dir) => table(s, dir, "orders")
        .select(
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("tier"))
        .groupBy("tier").agg(count(lit(1)).as("n"))
        .orderBy("tier"),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
             |            WHEN o_totalprice < 150000 THEN 'mid'
             |            ELSE 'high' END AS tier, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY tier""".stripMargin),
      "CASE WHEN bucketing + aggregation"),

    // Scalar subquery without driver round-trips: the global average joins
    // back in as a broadcast of a 1-row aggregate.
    "subquery_above_avg" -> Q(
      (s, dir) => {
        val perCust = table(s, dir, "orders")
          .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
        val avgSpend = perCust.agg(avg("spend").as("avg_spend"))
        perCust.join(broadcast(avgSpend))
          .filter(col("spend") > col("avg_spend"))
          .select(col("o_custkey"), round(col("spend"), 2).as("spend"))
          .orderBy("o_custkey")
      },
      Some("""WITH per_cust AS (
             |  SELECT o_custkey, sum(o_totalprice) AS spend
             |  FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, round(spend, 2) AS spend FROM per_cust
             |WHERE spend > (SELECT avg(spend) FROM per_cust)
             |ORDER BY o_custkey""".stripMargin),
      "scalar-subquery comparison via broadcast 1-row aggregate"),

    // Two-phase salted aggregation — the skew-mitigation pattern: phase 1
    // spreads a hot group key over 16 salt buckets (map-side partials land
    // on 16 reducers instead of 1), phase 2 merges the partials. The oracle
    // is the PLAIN aggregation: salting must be semantically invisible.
    "agg_salted" -> Q(
      (s, dir) => table(s, dir, "lineitem")
        .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(round(sum("q"), 2).as("sum_qty"), sum("c").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "salted two-phase aggregation (skew mitigation, semantically invisible)"),

    // Salted JOIN — the companion skew fix for joins: the big (fact) side
    // gets a deterministic salt, the small side is replicated across every
    // salt bucket, and the join key becomes (key, salt) — a hot supplier's
    // rows now land on 8 reducers instead of 1. AQE's skew-join split does
    // this adaptively; the explicit form is for engines/paths where it
    // can't (as-of joins, pinned shuffle_hash). The oracle is the PLAIN
    // join: salting must be semantically invisible.
    "join_salted" -> Q(
      (s, dir) => {
        val salts = 8
        val li = table(s, dir, "lineitem")
          .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(salts)).cast("int"))
        val sup = table(s, dir, "supplier")
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        li.join(sup.hint("shuffle_hash"),
            col("l_suppkey") === col("s_suppkey") && li("salt") === sup("salt"))
          .groupBy("s_name")
          .agg(round(sum("l_extendedprice"), 2).as("volume"), count(lit(1)).as("n_items"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, round(sum(l_extendedprice), 2) AS volume,
             |  count(*) AS n_items
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name ORDER BY s_name""".stripMargin),
      "salted join (replicated small side, skew-proof key spread, semantically invisible)"),

    // Column profiling — the data-quality sweep every ingest pipeline runs:
    // one pass per column (unioned), each a single partial-agg shuffle.
    "profile_customer" -> Q(
      (s, dir) => {
        val df = table(s, dir, "customer")
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
          .map { c =>
            df.agg(
              count(lit(1)).as("n"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
              countDistinct(col(c)).as("n_distinct"),
              min(col(c)).cast("string").as("min_s"),
              max(col(c)).cast("string").as("max_s"))
              .select(lit(c).as("column_name"), col("n"), col("n_null"),
                col("n_distinct"), col("min_s"), col("max_s"))
          }.reduce(_ unionByName _)
          .orderBy("column_name")
      },
      Some(Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .map(c => s"""SELECT '$c' AS column_name, count(*) AS n,
                     |  count(*) - count($c) AS n_null,
                     |  count(DISTINCT $c) AS n_distinct,
                     |  CAST(min($c) AS VARCHAR) AS min_s,
                     |  CAST(max($c) AS VARCHAR) AS max_s FROM customer""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),
      "per-column profiling: counts, nulls, distincts, min/max"),

    "table_counts" -> Q(
      (s, dir) => {
        import s.implicits._
        val names = Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
        names.map(n => table(s, dir, n).agg(count(lit(1)).as("n_rows"))
            .select(lit(n).as("tbl"), col("n_rows")))
          .reduce(_ unionByName _)
          .orderBy("tbl")
      },
      Some(Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
        .map(n => s"SELECT '$n' AS tbl, count(*) AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl")),
      "full-table counts over every harness table (F3/S5 surface)")
  )
}
