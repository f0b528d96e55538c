package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.AsofJoin
import graft.queries.Registry.{events, table}

/** Second relational wave: as-of / range joins, pivot, exact percentiles,
  * multiset set-ops, grouping sets through the SQL front end, and the
  * ranking-window family. */
object AdvancedQueries {

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Pick rule for `join_asof_nearest`, templated on what to emit for a
    * backward/forward winner (id or signed delta) — identical text in both
    * engines. Tolerance ±300 s in microseconds; a backward candidate wins
    * ties. All arithmetic is on non-null branches only (the IS NOT NULL
    * guards run first), so no engine sees a NULL comparison surprise. */
  private def nearestCase(back: String, fwd: String): String =
    s"""CASE WHEN prev_us IS NOT NULL AND p_us - prev_us <= 300000000
       |          AND (next_us IS NULL OR next_us - p_us > 300000000
       |               OR p_us - prev_us <= next_us - p_us)
       |     THEN $back
       |     WHEN next_us IS NOT NULL AND next_us - p_us <= 300000000
       |     THEN $fwd END""".stripMargin

  val all: Map[String, Q] = Map(
    // As-of join via union+window (see AsofJoin scaladoc for the 100 TB
    // rationale): most recent prior 'view' for each 'purchase'.
    "asof_view_before_purchase" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val isView = col("event_type") === "view"
        ev.withColumn("prev_view_id",
            last(when(isView, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("prev_view_us",
            last(when(isView, unix_micros(col("ts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "prev_view_id", "prev_view_us")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, prev_view_id, prev_view_us FROM (
             |  SELECT event_id, user_id, event_type,
             |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
             |      OVER w AS prev_view_id,
             |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
             |      OVER w AS prev_view_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin),
      "as-of join (latest earlier right row) via union+window"),

    // Tolerance-bounded NEAREST as-of join — the two-sided completion of
    // asof_view_before_purchase (pandas merge_asof direction='nearest',
    // tolerance=5min): for each purchase, the closest view of the same
    // user on EITHER side within ±300 s, ties to the earlier side, NULL
    // when nothing falls inside the tolerance. Same one-Exchange+one-Sort
    // union+window plan as the backward form — the forward frame rides
    // the SAME partition+sort, so "nearest" costs no extra shuffle over
    // "backward" (the naive formulation is a range join + per-row argmin:
    // a second shuffle AND a per-purchase aggregation). The pick rule is
    // one row-local CASE shared verbatim with the oracle.
    "join_asof_nearest" -> Q(
      (s, dir) => AsofJoin.nearestViewCandidates(events(s, dir))
        .withColumn("view_id", expr(nearestCase("prev_id", "next_id")))
        .withColumn("delta_us",
          expr(nearestCase("prev_us - p_us", "next_us - p_us")))
        .select("event_id", "user_id", "view_id", "delta_us")
        .orderBy("event_id"),
      Some(s"""WITH cand AS (
              |  SELECT event_id, user_id, event_type, epoch_us(ts) AS p_us,
              |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
              |      OVER wb AS prev_id,
              |    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
              |      OVER wb AS prev_us,
              |    first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
              |      OVER wf AS next_id,
              |    first_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
              |      OVER wf AS next_us
              |  FROM events
              |  WINDOW
              |    wb AS (PARTITION BY user_id ORDER BY ts, event_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
              |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
              |SELECT event_id, user_id,
              |  ${nearestCase("prev_id", "next_id")} AS view_id,
              |  ${nearestCase("prev_us - p_us", "next_us - p_us")} AS delta_us
              |FROM cand WHERE event_type = 'purchase'
              |ORDER BY event_id""".stripMargin),
      "nearest as-of join with tolerance: both directions from one partition+sort, row-local pick rule"),

    "join_range_followups" -> Q(
      (s, dir) => AsofJoin.followUpsWithin(events(s, dir)),
      Some("""SELECT p.event_id AS p_id, count(*) AS n_followups,
             |  min(e.event_id) AS first_follow_id
             |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
             |      WHERE event_type = 'purchase') p
             |JOIN (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) e
             |  ON p.user_id = e.user_id
             | AND e.us > p.us AND e.us <= p.us + 300000000
             |GROUP BY p.event_id ORDER BY p_id""".stripMargin),
      "range (band) join: equi-key + time-window predicate"),

    "pivot_segments" -> Q(
      (s, dir) => {
        val pivoted = table(s, dir, "customer")
          .groupBy("c_nationkey")
          .pivot("c_mktsegment", Segments)
          .count()
        pivoted.select(col("c_nationkey") +:
            Segments.map(seg => coalesce(col(s"`$seg`"), lit(0L)).as(seg)): _*)
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey,
              |${Segments.map(seg => s"  count(*) FILTER (c_mktsegment = '$seg') AS $seg").mkString(",\n")}
              |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "pivot (explicit values, no driver round-trip) vs FILTER aggregates"),

    // Exact percentiles (linear interpolation — same definition as DuckDB's
    // quantile_cont). SCALE WARNING: exact `percentile` is a
    // TypedImperativeAggregate whose buffer holds every value of the group —
    // with 3 o_orderstatus groups that is the whole fact column in three
    // in-memory buffers, an OOM at 100× data. This form exists as the
    // small-SF oracle variant only; the at-scale form is
    // `agg_percentiles_approx` below (bounded sketch buffer).
    "agg_percentiles" -> Q(
      (s, dir) => table(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
             |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      "exact percentiles with linear interpolation"),

    // The at-scale percentile form: `approx_percentile` (Greenwald-Khanna
    // sketch) keeps a buffer bounded by the accuracy parameter — O(accuracy)
    // per group regardless of group cardinality, vs the exact form's
    // O(group) buffer above. Sketches aren't bit-reproducible across
    // engines, so the oracle gates the ERROR BOUND instead: Spark persists
    // its approx values (OracleAux), DuckDB computes the exact quantiles
    // and echoes each approx value back only when it is within 2% relative
    // error — the hash matches iff every value is in bound. ApproxSpec pins
    // the same bound against the exact form in-engine.
    "agg_percentiles_approx" -> Q(
      (s, dir) => {
        val approx = table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            round(expr("approx_percentile(o_totalprice, 0.25, 10000)"), 4).as("p25"),
            round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4).as("p50"),
            round(expr("approx_percentile(o_totalprice, 0.75, 10000)"), 4).as("p75"),
            round(expr("approx_percentile(o_totalprice, 0.95, 10000)"), 4).as("p95"))
        OracleAux.persist(dir, "agg_pct_approx")(approx)
          .orderBy("o_orderstatus")
      },
      Some(s"""WITH approx AS (
              |  SELECT * FROM read_parquet(${OracleAux.duckGlob("agg_pct_approx")})),
              |exact AS (
              |  SELECT o_orderstatus,
              |    quantile_cont(o_totalprice, 0.25) AS e25,
              |    quantile_cont(o_totalprice, 0.5) AS e50,
              |    quantile_cont(o_totalprice, 0.75) AS e75,
              |    quantile_cont(o_totalprice, 0.95) AS e95
              |  FROM orders GROUP BY o_orderstatus)
              |SELECT a.o_orderstatus,
              |  CASE WHEN abs(a.p25 - e.e25) <= 0.02 * e.e25 THEN a.p25 END AS p25,
              |  CASE WHEN abs(a.p50 - e.e50) <= 0.02 * e.e50 THEN a.p50 END AS p50,
              |  CASE WHEN abs(a.p75 - e.e75) <= 0.02 * e.e75 THEN a.p75 END AS p75,
              |  CASE WHEN abs(a.p95 - e.e95) <= 0.02 * e.e95 THEN a.p95 END AS p95
              |FROM approx a JOIN exact e USING (o_orderstatus)
              |ORDER BY o_orderstatus""".stripMargin),
      "approx_percentile sketch (bounded buffer, the 100 TB form) with oracle-gated error bound"),

    // The at-scale distinct-count form: HyperLogLog++ keeps a constant-size
    // mergeable sketch per group (map-side partial merge, O(1/rsd²) bytes),
    // vs COUNT(DISTINCT)'s shuffle of every distinct value. Sketches aren't
    // bit-reproducible across engines, so — like agg_percentiles_approx —
    // the oracle gates the ERROR: DuckDB echoes Spark's estimate back only
    // when it is within 5% of the exact count (rsd=0.02, so 5% is >2σ).
    "agg_approx_distinct" -> Q(
      (s, dir) => {
        val approx = table(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
        OracleAux.persist(dir, "agg_approx_distinct")(approx)
          .orderBy("o_orderstatus")
      },
      Some(s"""WITH approx AS (
              |  SELECT * FROM read_parquet(${OracleAux.duckGlob("agg_approx_distinct")})),
              |exact AS (
              |  SELECT o_orderstatus, count(DISTINCT o_custkey) AS e
              |  FROM orders GROUP BY o_orderstatus)
              |SELECT a.o_orderstatus,
              |  CASE WHEN abs(a.approx_custs - e.e) <= 0.05 * e.e THEN a.approx_custs END AS approx_custs
              |FROM approx a JOIN exact e USING (o_orderstatus)
              |ORDER BY o_orderstatus""".stripMargin),
      "HyperLogLog++ distinct-count sketch with oracle-gated error bound"),

    "setops_all" -> Q(
      (s, dir) => {
        val a = table(s, dir, "lineitem")
          .filter(col("l_orderkey") % 5 === 0).select("l_linenumber")
        val b = table(s, dir, "lineitem")
          .filter(col("l_orderkey") % 7 === 0).select("l_linenumber")
        a.exceptAll(b).groupBy("l_linenumber").agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("except_all"))
          .unionByName(
            a.intersectAll(b).groupBy("l_linenumber").agg(count(lit(1)).as("n"))
              .withColumn("tag", lit("intersect_all")))
          .select("tag", "l_linenumber", "n")
          .orderBy("tag", "l_linenumber")
      },
      Some("""WITH a AS (SELECT l_linenumber FROM lineitem WHERE l_orderkey % 5 = 0),
             |     b AS (SELECT l_linenumber FROM lineitem WHERE l_orderkey % 7 = 0)
             |SELECT 'except_all' AS tag, l_linenumber, count(*) AS n
             |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY l_linenumber
             |UNION ALL
             |SELECT 'intersect_all', l_linenumber, count(*)
             |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY l_linenumber
             |ORDER BY tag, l_linenumber""".stripMargin),
      "multiset EXCEPT ALL / INTERSECT ALL"),

    // The SQL front end: same engine, text plans — GROUPING SETS has no
    // direct DataFrame API, so this also covers that gap.
    "sql_grouping_sets" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                |  coalesce(l_linestatus, 'ALL') AS ls,
                |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
                |FROM lineitem_v
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY rf, ls""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY rf, ls""".stripMargin),
      "GROUPING SETS through spark.sql (SQL front end)"),

    "window_ranking" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
        table(s, dir, "orders")
          .filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).as("quartile"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  CAST(rank() OVER w AS INTEGER) AS rnk,
             |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume
             |FROM orders WHERE o_orderkey % 13 = 0
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      "ranking-window family: ntile, rank, dense_rank, percent_rank, cume_dist"),

    // Custom native expression through the SQL front end (registered via
    // GraftExtensions — SparkSessionExtensions/FunctionRegistry seam).
    "sql_vector_dot" -> Q(
      (s, dir) => {
        graft.plans.GraftExtensions.register(s)
        table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
        s.sql("""SELECT vec_id, round(vector_dot(embedding, embedding), 4) AS norm_sq
                |FROM embeddings_v ORDER BY vec_id""".stripMargin)
      },
      Some("""SELECT vec_id,
             |  round(list_dot_product(CAST(embedding AS DOUBLE[]),
             |                         CAST(embedding AS DOUBLE[])), 4) AS norm_sq
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      "custom codegen expression exposed as a SQL function"),

    // Whole-operator extension: custom LogicalPlan + Strategy + SparkPlan
    // (bounded per-group heaps, O(n log k) after the key shuffle) — same
    // semantics and oracle as the window formulation above.
    "topk_native" -> Q(
      (s, dir) => graft.plans.TopKPerGroup(
          table(s, dir, "orders"), 3, Seq("o_custkey"),
          Seq(("o_totalprice", false), ("o_orderkey", true)))
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      "custom top-k-per-group plan node (LogicalPlan+Strategy+SparkPlan)"),

    // Correlated scalar subquery through the SQL front end — Catalyst's
    // DecorrelateInnerQuery rewrites it to an aggregate + join (SURVEY §4).
    "sql_correlated" -> Q(
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT c_custkey, c_acctbal FROM customer_v c
                |WHERE c_acctbal > 2 * (SELECT avg(c2.c_acctbal) FROM customer_v c2
                |                       WHERE c2.c_nationkey = c.c_nationkey)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer c
             |WHERE c_acctbal > 2 * (SELECT avg(c2.c_acctbal) FROM customer c2
             |                       WHERE c2.c_nationkey = c.c_nationkey)
             |ORDER BY c_custkey""".stripMargin),
      "correlated scalar subquery (decorrelated to aggregate+join)"),

    "window_value_fns" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        table(s, dir, "orders")
          .filter(col("o_orderkey") % 53 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            first("o_orderkey").over(wFull).as("first_key"),
            last("o_orderkey").over(wFull).as("last_key"),
            nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"),
            lead("o_orderkey", 1).over(w).as("next_key"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  first_value(o_orderkey) OVER wf AS first_key,
             |  last_value(o_orderkey) OVER wf AS last_key,
             |  nth_value(o_orderkey, 2) OVER wf AS second_key,
             |  lead(o_orderkey, 1) OVER w AS next_key
             |FROM orders WHERE o_orderkey % 53 = 0
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey),
             |  wf AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin),
      "window value functions: first/last/nth_value, lead over full frames"),

    // Ordered list aggregation, emitted as a joined string so the compare
    // is scalar (array cells don't hash uniformly across engines).
    "agg_collect" -> Q(
      (s, dir) => table(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .groupBy("c_nationkey")
        .agg(concat_ws(",", sort_array(collect_list("c_name"))).as("names"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names
             |FROM customer WHERE c_custkey % 100 = 0
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "ordered collect_list aggregation (string-joined for comparison)")
  )
}
