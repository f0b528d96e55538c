package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Registry.table

/** The remaining TPC-H query shapes expressible over the harness star
  * schema (TESTDATA.md has no `partsupp`, `l_commitdate`/`l_receiptdate`
  * or `l_shipmode`, so Q2/Q11/Q20 are out of reach and Q12/Q21 use
  * shipdate-lateness adaptations, noted per query). Together with
  * RelationalQueries' q1/q3/q4/q5/q6/q13/q14/q16/q18/q22 this covers every
  * TPC-H pattern the schema can express: multi-nation self-aliased dims,
  * CASE market share, LIKE scans, group-wise top-k, conditional counts,
  * view + scalar-max, correlated per-group averages, disjunctive
  * pushdown, and EXISTS / NOT EXISTS chains.
  *
  * Plan posture is uniform: dims broadcast, lineitem⋈orders is the one
  * keyed shuffle, filters sit on the scan side of every join, output is
  * fully ordered + rounded for the cross-engine compare.
  */
object TpchExtraQueries {

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  // Wide per-group sums (every money aggregate in this file)
  // drift by a final cent between engines when the double additions happen
  // in different orders. Casting each term to DECIMAL(18,4) first makes
  // the sum exact and order-independent; the per-row double product is
  // IEEE-identical on both engines, and binary doubles never land on an
  // exact decimal rounding tie, so the cast agrees too.
  private val revenueDec = revenue.cast("decimal(18,4)")
  private val revenueDecSql = s"CAST($revenueSql AS DECIMAL(18,4))"

  private val base: Map[String, Q] = Map(
    // Q7: shipping volume between two nations by year — the two nation
    // roles come from self-aliased broadcast dims.
    "q7_volume_shipping" -> Q(
      (s, dir) => {
        val n1 = table(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = table(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(revenueDec), 2).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
              |  CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
              |FROM (
              |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |    CAST(year(l_shipdate) AS INTEGER) AS l_year, $revenueDecSql AS volume
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |    AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      "TPC-H Q7 shape: bidirectional nation-pair shipping volume by year"),

    // Q8: a nation's market share inside a region for one part type.
    "q8_market_share" -> Q(
      (s, dir) => {
        val n1 = table(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = table(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
        val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
        val p = table(s, dir, "part").filter(col("p_type") === "ECONOMY")
        table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .join(broadcast(r), col("c_rk") === col("r_regionkey"))
          .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3", revenueDec)
              .otherwise(lit(0.0).cast("decimal(18,4)"))).cast("double")
              / sum(revenueDec).cast("double"),
            4).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
              |  round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $revenueDecSql
              |                  ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
              |        / CAST(sum($revenueDecSql) AS DOUBLE), 4) AS mkt_share
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |JOIN region ON n2.n_regionkey = r_regionkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      "TPC-H Q8 shape: nation market share within a region (CASE-share aggregate)"),

    // Q9: product-line profit by supplier nation × order year. The schema
    // has no partsupp, so profit omits the classic ps_supplycost term —
    // the join/agg shape is Q9's.
    "q9_product_profit" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part").filter(col("p_name").contains("widget"))
        table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(revenueDec), 2).cast("double").as("sum_profit"))
          .orderBy(asc("nation"), desc("o_year"))
      },
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
              |  CAST(round(sum($revenueDecSql), 2) AS DOUBLE) AS sum_profit
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE p_name LIKE '%widget%'
              |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
      "TPC-H Q9 shape: LIKE-filtered product-line profit by nation × year"),

    // Q10: top returned-revenue customers in a quarter.
    "q10_returned_items" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(round(sum(revenueDec), 2).cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
              |  SELECT c_custkey, c_name, c_acctbal, n_name,
              |    CAST(round(sum($revenueDecSql), 2) AS DOUBLE) AS revenue
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  WHERE l_returnflag = 'R'
              |    AND o_orderdate >= TIMESTAMP '1996-01-01'
              |    AND o_orderdate < TIMESTAMP '1996-04-01'
              |  GROUP BY 1, 2, 3, 4)
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      "TPC-H Q10 shape: top returned-revenue customers (grouped top-k)"),

    // Q12 adapted: the schema has no l_shipmode/l_commitdate, so the
    // two-bucket split is ship lateness (> 90 days after order) instead of
    // ship mode — the conditional-count shape is Q12's.
    "q12_late_shipments" -> Q(
      (s, dir) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        table(s, dir, "lineitem")
          .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .withColumn("ship_class",
            when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "LATE")
              .otherwise("ONTIME"))
          .groupBy("ship_class")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("ship_class")
      },
      Some("""SELECT ship_class,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM (
             |  SELECT o_orderpriority,
             |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'LATE' ELSE 'ONTIME' END AS ship_class
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      "TPC-H Q12 shape: priority mix by ship-lateness bucket (conditional counts)"),

    // Q15: quarterly revenue view + scalar-max top supplier(s).
    "q15_top_supplier" -> Q(
      (s, dir) => {
        val rev = table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(revenueDec), 2).cast("double").as("total_revenue"))
        val top = rev.agg(max("total_revenue").as("max_revenue"))
        rev.join(broadcast(top), col("total_revenue") === col("max_revenue"))
          .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, CAST(round(sum($revenueDecSql), 2) AS DOUBLE) AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM rev JOIN supplier ON l_suppkey = s_suppkey
              |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
              |ORDER BY s_suppkey""".stripMargin),
      "TPC-H Q15 shape: revenue view + scalar-max top supplier"),

    // Q17: revenue lost to small-quantity orders — per-part average as a
    // broadcastable aggregate instead of a per-row correlated subquery.
    "q17_small_quantity" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part")
          .filter(col("p_brand") === "Brand#13" && col("p_size") < 15)
          .select("p_partkey")
        val li = table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        val caps = li.groupBy(col("l_partkey").as("cap_pk"))
          .agg((avg("l_quantity") * 0.2).as("qty_cap"))
        li.join(caps, col("l_partkey") === col("cap_pk"))
          .filter(col("l_quantity") < col("qty_cap"))
          .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0, 2)
            .as("avg_yearly"))
      },
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#13' AND p_size < 15
             |  AND l_quantity < (
             |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
             |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin),
      "TPC-H Q17 shape: per-part correlated average gate (expressed as one agg + join)"),

    // Q19: disjunction of brand/size/quantity bands — one OR predicate
    // evaluated after a broadcast part join, single-row revenue.
    "q19_disjunctive" -> Q(
      (s, dir) => {
        val p = table(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        def band(brand: String, sizeHi: Int, qLo: Double, qHi: Double) =
          col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
            col("l_quantity").between(qLo, qHi)
        table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(band("Brand#1", 10, 1, 15) || band("Brand#9", 20, 5, 25) ||
            band("Brand#20", 30, 10, 35))
          .agg(round(sum(revenueDec), 2).cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(round(sum($revenueDecSql), 2) AS DOUBLE) AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
              |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 5 AND 25)
              |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 35)""".stripMargin),
      "TPC-H Q19 shape: disjunctive brand/size/quantity revenue"),

    // Q21 adapted: no receipt/commit dates, so "kept the order waiting"
    // means shipped > 60 days after the order date; the EXISTS (another
    // supplier on the order) / NOT EXISTS (another LATE supplier) chain is
    // Q21's, planned as one semi + one anti join.
    "q21_waiting_supplier" -> Q(
      (s, dir) => {
        val late = table(s, dir, "lineitem")
          .join(table(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select("l_orderkey", "l_suppkey")
        val others = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOthers = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        late
          .join(others, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_semi")
          .join(lateOthers, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
            "left_anti")
          .join(broadcast(table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
          .limit(10)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM late l3
             |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin),
      "TPC-H Q21 shape: only-late supplier on multi-supplier orders (semi + anti chain)")
  )

  /** True when the driver ships `partsupp.parquet` at any harness scale —
    * the availability gate for the three TPC-H shapes that need it
    * (Q2/Q11/Q20, SURVEY.md's standing "missing" item). Checked once at
    * registry load, so the trio self-registers the moment the table
    * exists, with no code change. */
  lazy val partsuppAvailable: Boolean =
    Seq("sf0.001", "sf0.01", "sf0.1").exists(sf =>
      new java.io.File(s"/root/testdata/$sf/partsupp.parquet").exists)

  /** The partsupp-gated trio, assuming the standard TPC-H columns
    * (ps_partkey, ps_suppkey, ps_availqty, ps_supplycost). Exposed
    * unconditionally so TpchPartsuppSpec can exercise it against a
    * synthesized fixture dir; registered only when [[partsuppAvailable]].
    * Plan posture matches the rest of the file: dims broadcast, the one
    * data-sized relation (partsupp / lineitem) keyed-shuffles, per-part
    * reductions are combinable aggregates joined back shuffle_hash. */
  val partsuppGated: Map[String, Q] = Map(
    // Q2: minimum-cost regional supplier per qualifying part. The min is
    // a groupBy + equi-join-back (never a window over partsupp); equality
    // on ps_supplycost is exact — both engines compare the same stored
    // double against a min SELECTED from the same values.
    "q2_min_cost_supplier" -> Q(
      (s, dir) => {
        val reg = table(s, dir, "region").filter(col("r_name") === "ASIA")
        val rnat = table(s, dir, "nation")
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val rsupp = table(s, dir, "supplier")
          .join(broadcast(rnat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val prt = table(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select("p_partkey", "p_brand")
        val regional = table(s, dir, "partsupp")
          .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
          .join(broadcast(rsupp), col("ps_suppkey") === col("s_suppkey"))
        val minCost = regional.groupBy(col("p_partkey").as("mp"))
          .agg(min("ps_supplycost").as("mc"))
        regional
          .join(minCost.hint("shuffle_hash"),
            col("p_partkey") === col("mp") && col("ps_supplycost") === col("mc"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("ps_supplycost"))
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH rsupp AS (
             |  SELECT s_suppkey, s_name, s_acctbal, n_name
             |  FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA'),
             |regional AS (
             |  SELECT p.p_partkey, p.p_brand, ps.ps_supplycost,
             |         r.s_acctbal, r.s_name, r.n_name
             |  FROM partsupp ps
             |  JOIN part p ON ps.ps_partkey = p.p_partkey
             |  JOIN rsupp r ON ps.ps_suppkey = r.s_suppkey
             |  WHERE p.p_type = 'ECONOMY'),
             |mc AS (SELECT p_partkey, min(ps_supplycost) AS mc
             |       FROM regional GROUP BY 1)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
             |FROM regional JOIN mc USING (p_partkey)
             |WHERE ps_supplycost = mc
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin),
      "TPC-H Q2 shape: minimum-cost regional supplier per part (agg + join-back, no window)"),

    // Q11: a nation's stock value per part, kept when above 1/10000 of
    // the national total. The fraction compares in EXACT decimal
    // (value·10000 > total) — a double threshold would flip boundary
    // rows between engines.
    "q11_important_stock" -> Q(
      (s, dir) => {
        val nsupp = table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation").filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val byPart = table(s, dir, "partsupp")
          .join(broadcast(nsupp), col("ps_suppkey") === col("s_suppkey"))
          .withColumn("v",
            (col("ps_supplycost") * col("ps_availqty")).cast("decimal(18,4)"))
          .groupBy("ps_partkey").agg(sum("v").as("value"))
        val tot = byPart.agg(sum("value").as("total"))
        byPart.crossJoin(broadcast(tot))
          .filter(col("value") * 10000 > col("total"))
          .select(col("ps_partkey"),
            round(col("value"), 2).cast("double").as("value"))
          .orderBy(desc("value"), col("ps_partkey"))
      },
      Some("""WITH byp AS (
             |  SELECT ps_partkey,
             |    sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4))) AS value
             |  FROM partsupp
             |  JOIN supplier ON ps_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name = 'NATION_3'
             |  GROUP BY ps_partkey),
             |tot AS (SELECT sum(value) AS total FROM byp)
             |SELECT ps_partkey, CAST(round(value, 2) AS DOUBLE) AS value
             |FROM byp CROSS JOIN tot
             |WHERE value * 10000 > total
             |ORDER BY value DESC, ps_partkey""".stripMargin),
      "TPC-H Q11 shape: per-part national stock value above an exact-decimal total fraction"),

    // Q20: suppliers holding excess stock (availqty > half the 1995
    // shipped quantity) of a qualifying part. Quantity sums are small
    // integers stored as doubles, and ·0.5 is exact in binary — the
    // comparison cannot drift between engines.
    "q20_potential_promotion" -> Q(
      (s, dir) => {
        val qty95 = table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum("l_quantity").as("qty"))
        val bolts = table(s, dir, "part")
          .filter(col("p_name").like("%bolt%")).select("p_partkey")
        val excess = table(s, dir, "partsupp")
          .join(broadcast(bolts), col("ps_partkey") === col("p_partkey"))
          .join(qty95.hint("shuffle_hash"),
            col("ps_partkey") === col("l_partkey") &&
              col("ps_suppkey") === col("l_suppkey"))
          .filter(col("ps_availqty") > col("qty") * 0.5)
          .select(col("ps_suppkey")).distinct()
        table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation").filter(col("n_name") === "NATION_8")),
            col("s_nationkey") === col("n_nationkey"))
          .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_name")
      },
      Some("""WITH qty95 AS (
             |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-01-01'
             |  GROUP BY 1, 2),
             |excess AS (
             |  SELECT DISTINCT ps_suppkey
             |  FROM partsupp
             |  JOIN part ON ps_partkey = p_partkey
             |  JOIN qty95 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
             |  WHERE p_name LIKE '%bolt%' AND ps_availqty > qty * 0.5)
             |SELECT s_suppkey, s_name
             |FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_8'
             |  AND EXISTS (SELECT 1 FROM excess e WHERE e.ps_suppkey = s_suppkey)
             |ORDER BY s_name""".stripMargin),
      "TPC-H Q20 shape: excess-stock suppliers of shipped parts (agg + semi chain)")
  )

  def all: Map[String, Q] =
    if (partsuppAvailable) base ++ partsuppGated else base
}
