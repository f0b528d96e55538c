package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Registry.table

/** Statistical analytics / experimentation operators — the read-side
  * queries a data platform runs beside the curation pipeline: trend fits,
  * robust outlier screens, A/B test readouts, and mergeable-sketch
  * rollups for distinct-count dashboards.
  *
  * Scale contract shared by the family: every statistic here is computed
  * from COMBINABLE per-group summaries (moment sums, exact percentiles
  * over bounded group counts, HLL registers) — one shuffle keyed by the
  * group column, map-side partial aggregation, broadcast-only stats
  * joins. No operator materializes per-row intermediates wider than the
  * input row, so each plan survives a 1000-executor scale-up unchanged.
  * Determinism follows the house contract (SURVEY §7.4): fixed rounding
  * on floating aggregates, full ORDER BY on output.
  */
object StatsQueries {

  val all: Map[String, Q] = Map(

    // Kaplan–Meier survival curve over user lifetimes (Kaplan & Meier
    // 1958) — the time-to-churn estimator a retention pipeline publishes.
    // Lifetime = days between a user's first and last event; every user
    // is observed to their last event and censored only at the data's
    // end, so the KM product ∏(1 − dⱼ/nⱼ) TELESCOPES to the exact
    // survival fraction (n_risk − churned)/N — no sequential product,
    // no floating accumulation: every number here is a ratio of exact
    // BIGINT counts, so both engines agree bit-for-bit before rounding.
    // Plan: one combinable user-keyed agg (event-scale), then the
    // lifetime histogram (day-domain-sized, ~tens of rows) feeds a
    // broadcast range self-join for the at-risk suffix counts — the same
    // tiny-aggregate range-join shape as stats_kstest's bucket offsets;
    // nothing downstream of the first agg scales with event volume.
    "events_survival" -> Q(
      (s, dir) => {
        val life = Registry.events(s, dir).groupBy("user_id")
          .agg(datediff(max(col("ts").cast("date")),
            min(col("ts").cast("date"))).cast("long").as("lifetime_d"))
        val byL = life.groupBy("lifetime_d").agg(count(lit(1)).as("churned"))
        val n = byL.agg(sum("churned").as("n_users"))
        byL.as("x")
          .join(broadcast(byL.as("y")),
            col("y.lifetime_d") >= col("x.lifetime_d"))
          .groupBy(col("x.lifetime_d").as("lifetime_d"))
          .agg(sum(col("y.churned")).as("n_risk"),
            max(col("x.churned")).as("churned"))
          .crossJoin(broadcast(n))
          .select(col("lifetime_d"), col("n_risk"), col("churned"),
            round((col("n_risk") - col("churned")).cast("double")
              / col("n_users"), 4).as("survival"))
          .orderBy("lifetime_d")
      },
      Some("""WITH life AS (
             |  SELECT user_id,
             |    date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS lifetime_d
             |  FROM events GROUP BY 1),
             |byl AS (SELECT lifetime_d, count(*) AS churned FROM life GROUP BY 1),
             |n AS (SELECT CAST(sum(churned) AS BIGINT) AS n_users FROM byl)
             |SELECT x.lifetime_d, CAST(sum(y.churned) AS BIGINT) AS n_risk,
             |  CAST(any_value(x.churned) AS BIGINT) AS churned,
             |  round((sum(y.churned) - any_value(x.churned))
             |    / CAST(any_value(n_users) AS DOUBLE), 4) AS survival
             |FROM byl x JOIN byl y ON y.lifetime_d >= x.lifetime_d CROSS JOIN n
             |GROUP BY x.lifetime_d ORDER BY x.lifetime_d""".stripMargin),
      "Kaplan–Meier survival over user lifetimes (end-censoring telescopes to exact counts)"),

    // Spearman rank correlation of line-item quantity vs extended price —
    // the monotonic-association twin of stats_covariance's Pearson (the
    // robust screen when the relationship is nonlinear or heavy-tailed).
    // Ranks are EXACT average ranks carried as 2·rank integers
    // (2·cum_before + cnt + 1 — fractional .5 ties stay integral), built
    // per variable from its value histogram with the shared [[PrefixSum]]
    // two-level machinery (bucket totals → broadcast range-join offsets →
    // bucket-partitioned intra-cumsum — never an unpartitioned window,
    // never a row-level sort). Rank moments
    // accumulate in DECIMAL(38,0)/HUGEINT (Σr²≈4n³ needs int128 past
    // ~10⁶ rows); the closed form divides as doubles, identical IEEE ops
    // in both engines. Joins back to rows are value-keyed equi-joins on
    // histogram-sized tables. Scale invariant: ranks are per-variable
    // global, but all global coordination lives in the 1024-bucket
    // offsets frame, so parallelism is unbounded by row count.
    "stats_spearman" -> Q(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_quantity").cast("double").as("q"),
            col("l_extendedprice").cast("double").as("p"))
        // ONE pruned-two-column scalar probe for both variables' ranges
        // (the pack_sequences pattern); null min/max = empty table → any
        // constant range works
        val mm = li.agg(min(col("q")), max(col("q")),
          min(col("p")), max(col("p"))).collect()(0)
        def bound(i: Int): Double =
          Option(mm.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        val bounds = Map("q" -> (bound(0), bound(1)), "p" -> (bound(2), bound(3)))
        def rank2(c: String): DataFrame = {
          val byV = li.select(col(c).as("v"))
            .groupBy("v").agg(count(lit(1)).as("cnt"))
          graft.ext.PrefixSum.rank2(byV, "v", "cnt", Some(bounds(c)))
            .select("v", "r2")
        }
        val ranked = li
          .join(rank2("q").withColumnRenamed("v", "q")
            .withColumnRenamed("r2", "rq").hint("shuffle_hash"), "q")
          .join(rank2("p").withColumnRenamed("v", "p")
            .withColumnRenamed("r2", "rp").hint("shuffle_hash"), "p")
        ranked.agg(count(lit(1)).as("n"),
            sum(expr("CAST(rq AS DECIMAL(38,0))")).as("sq"),
            sum(expr("CAST(rp AS DECIMAL(38,0))")).as("sp"),
            sum(expr("CAST(rq AS DECIMAL(38,0)) * rq")).as("sqq"),
            sum(expr("CAST(rp AS DECIMAL(38,0)) * rp")).as("spp"),
            sum(expr("CAST(rq AS DECIMAL(38,0)) * rp")).as("sqp"))
          .select(col("n"),
            round((col("n").cast("double") * col("sqp").cast("double")
                - col("sq").cast("double") * col("sp").cast("double"))
              / sqrt((col("n").cast("double") * col("sqq").cast("double")
                  - col("sq").cast("double") * col("sq").cast("double"))
                * (col("n").cast("double") * col("spp").cast("double")
                  - col("sp").cast("double") * col("sp").cast("double"))), 6)
              .as("spearman"))
      },
      Some("""WITH li AS (
             |  SELECT CAST(l_quantity AS DOUBLE) AS q,
             |    CAST(l_extendedprice AS DOUBLE) AS p
             |  FROM lineitem),
             |qh AS (SELECT q AS v, count(*) AS cnt FROM li GROUP BY q),
             |qr AS (SELECT v,
             |    2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
             |      + cnt + 1 AS r2
             |  FROM qh),
             |ph AS (SELECT p AS v, count(*) AS cnt FROM li GROUP BY p),
             |pr AS (SELECT v,
             |    2 * (sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
             |      + cnt + 1 AS r2
             |  FROM ph),
             |rk AS (
             |  SELECT CAST(qr.r2 AS HUGEINT) AS rq, CAST(pr.r2 AS HUGEINT) AS rp
             |  FROM li JOIN qr ON qr.v = li.q JOIN pr ON pr.v = li.p),
             |m AS (
             |  SELECT count(*) AS n, sum(rq) AS sq, sum(rp) AS sp,
             |    sum(rq * rq) AS sqq, sum(rp * rp) AS spp, sum(rq * rp) AS sqp
             |  FROM rk)
             |SELECT n,
             |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
             |      - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
             |        - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
             |      * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
             |        - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS spearman
             |FROM m""".stripMargin),
      "Spearman rank correlation (exact 2x-average-ranks, two-level prefix-sum ranking)"),

    // Per-group ordinary least squares fit from one combinable moment
    // aggregate: n, Σx, Σy, Σxy, Σx², Σy² per group, closed-form
    // slope/intercept/R² on the 3-row result. The classic "fit a trend
    // per segment" query — ONE map-side-combinable shuffle regardless of
    // corpus size (the alternative ML-library path collects vectors;
    // this stays in whole-stage codegen end to end).
    "stats_regression" -> Q(
      (s, dir) => {
        val li = table(s, dir, "lineitem").select(
          col("l_returnflag"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        li.groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .withColumn("slope_raw",
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))
          .select(
            col("l_returnflag"),
            col("n").cast("long").as("n"),
            round(col("slope_raw"), 4).as("slope"),
            round((col("sy") - col("slope_raw") * col("sx")) / col("n"), 4)
              .as("intercept"),
            round(
              pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
                ((col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("r2"))
          .orderBy("l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
             |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
             |    sum(l_quantity * l_extendedprice) AS sxy,
             |    sum(l_quantity * l_quantity) AS sxx,
             |    sum(l_extendedprice * l_extendedprice) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
             |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) AS intercept,
             |  round(pow(n*sxy - sx*sy, 2) /
             |        ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
             |FROM m ORDER BY l_returnflag""".stripMargin),
      "per-group OLS trend fit from one combinable moment aggregate"),

    // Robust outlier screen: per-group median + MAD (median absolute
    // deviation), modified z-score |0.6745·(x−med)/MAD| > 3.5 — the
    // Iglewicz-Hoaglin rule that survives the heavy tails a mean/σ screen
    // (events_anomaly) is blinded by. Two exact-percentile aggregates
    // over a BOUNDED group count (order statuses), stats rejoined via
    // broadcast — the fact table is scanned, never sorted globally.
    "stats_mad_outliers" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders").select(
          col("o_orderstatus"), col("o_totalprice").cast("double").as("v"))
        val med = o.groupBy("o_orderstatus")
          .agg(expr("percentile(v, 0.5)").as("med"))
        val mad = o.join(broadcast(med), "o_orderstatus")
          .groupBy("o_orderstatus")
          .agg(expr("percentile(abs(v - med), 0.5)").as("mad"))
        val stats = med.join(broadcast(mad), "o_orderstatus")
        o.join(broadcast(stats), "o_orderstatus")
          .withColumn("mz", lit(0.6745) * (col("v") - col("med")) / col("mad"))
          .groupBy("o_orderstatus")
          .agg(
            count(lit(1)).as("n"),
            round(min(col("med")), 4).as("med"),
            round(min(col("mad")), 4).as("mad"),
            count(when(abs(col("mz")) > 3.5, 1)).as("n_outliers"),
            round(avg(when(abs(col("mz")) <= 3.5, col("v"))), 4).as("avg_inlier"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (
             |  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
             |  FROM orders GROUP BY 1),
             |d AS (
             |  SELECT o.o_orderstatus,
             |    quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
             |  FROM orders o JOIN m USING (o_orderstatus) GROUP BY 1),
             |st AS (SELECT m.o_orderstatus, med, mad FROM m JOIN d USING (o_orderstatus))
             |SELECT o.o_orderstatus, count(*) AS n,
             |  round(min(med), 4) AS med, round(min(mad), 4) AS mad,
             |  count(CASE WHEN abs(0.6745*(o.o_totalprice - med)/mad) > 3.5 THEN 1 END)
             |    AS n_outliers,
             |  round(avg(CASE WHEN abs(0.6745*(o.o_totalprice - med)/mad) <= 3.5
             |            THEN o.o_totalprice END), 4) AS avg_inlier
             |FROM orders o JOIN st USING (o_orderstatus)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      "median/MAD robust outlier screen (modified z-score, broadcast stats)"),

    // A/B experiment readout: hash-split purchase events into two arms,
    // Welch's unequal-variance t statistic + Welch-Satterthwaite df from
    // ONE conditional aggregate over the fact scan — no join, no
    // per-arm subquery, single map-side-combinable pass. The readout
    // every experimentation platform serves; at 100 TB the plan is one
    // scan + a 1-row reduce.
    "stats_abtest" -> Q(
      (s, dir) => {
        val e = Registry.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).as("a"),
            col("value").cast("double").as("v"))
        e.agg(
            count(when(col("a"), 1)).cast("double").as("na"),
            count(when(!col("a"), 1)).cast("double").as("nb"),
            avg(when(col("a"), col("v"))).as("ma"),
            avg(when(!col("a"), col("v"))).as("mb"),
            var_samp(when(col("a"), col("v"))).as("va"),
            var_samp(when(!col("a"), col("v"))).as("vb"))
          .withColumn("se2", col("va") / col("na") + col("vb") / col("nb"))
          .select(
            col("na").cast("long").as("n_a"),
            col("nb").cast("long").as("n_b"),
            round(col("ma"), 4).as("mean_a"),
            round(col("mb"), 4).as("mean_b"),
            round((col("ma") - col("mb")) / sqrt(col("se2")), 4).as("welch_t"),
            round(
              pow(col("se2"), 2) /
                (pow(col("va") / col("na"), 2) / (col("na") - 1) +
                  pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 2)
              .as("welch_df"),
            round(col("mb") / col("ma") - 1, 6).as("rel_lift_b"))
      },
      Some("""WITH s AS (
             |  SELECT
             |    CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS DOUBLE) AS na,
             |    CAST(count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS DOUBLE) AS nb,
             |    avg(CASE WHEN user_id % 2 = 0 THEN value END) AS ma,
             |    avg(CASE WHEN user_id % 2 <> 0 THEN value END) AS mb,
             |    var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS va,
             |    var_samp(CASE WHEN user_id % 2 <> 0 THEN value END) AS vb
             |  FROM events WHERE event_type = 'purchase')
             |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
             |  round((ma - mb) / sqrt(va/na + vb/nb), 4) AS welch_t,
             |  round(pow(va/na + vb/nb, 2) /
             |        (pow(va/na, 2)/(na-1) + pow(vb/nb, 2)/(nb-1)), 2) AS welch_df,
             |  round(mb/ma - 1, 6) AS rel_lift_b
             |FROM s""".stripMargin),
      "Welch t-test A/B readout from one conditional aggregate pass"),

    // Population Stability Index — the drift monitor every deployed model
    // runs: bin the CURRENT sample by the REFERENCE sample's deciles
    // (exact percentiles, broadcast as one 9-element row — the
    // feature_bins pattern) and compare bin shares with the standard
    // Σ (p_cur − p_ref)·ln(p_cur/p_ref). Laplace smoothing (+1 per bin)
    // keeps empty bins finite and is applied identically in the oracle;
    // the ln inputs are exact integer ratios, so rounding to 6 absorbs
    // any last-ulp libm drift. Plan: one percentile agg over the ref
    // half, one binned groupBy over the fact scan, broadcast-only joins.
    "stats_psi" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders").select(
          col("o_totalprice").cast("double").as("v"),
          (col("o_orderkey") % 2 === 0).as("is_ref"))
        val cuts = o.filter(col("is_ref"))
          .agg(expr("percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
            .as("cuts"))
        val bin = (1 to 9).map(i =>
          when(col("v") > element_at(col("cuts"), i), 1).otherwise(0))
          .reduce(_ + _)
        val counts = o.crossJoin(broadcast(cuts))
          .withColumn("bin", bin)
          .groupBy("bin")
          .agg(count(when(col("is_ref"), 1)).as("n_ref"),
            count(when(!col("is_ref"), 1)).as("n_cur"))
        val totals = counts.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
        counts.crossJoin(broadcast(totals))
          .withColumn("p_ref",
            (col("n_ref") + 1).cast("double") / (col("t_ref") + 10))
          .withColumn("p_cur",
            (col("n_cur") + 1).cast("double") / (col("t_cur") + 10))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
              .as("psi_contrib"))
          .orderBy("bin")
      },
      Some("""WITH o AS (
             |  SELECT CAST(o_totalprice AS DOUBLE) AS v,
             |    o_orderkey % 2 = 0 AS is_ref FROM orders),
             |cuts AS (
             |  SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c
             |  FROM o WHERE is_ref),
             |binned AS (
             |  SELECT is_ref,
             |    (CASE WHEN v > c[1] THEN 1 ELSE 0 END) + (CASE WHEN v > c[2] THEN 1 ELSE 0 END) +
             |    (CASE WHEN v > c[3] THEN 1 ELSE 0 END) + (CASE WHEN v > c[4] THEN 1 ELSE 0 END) +
             |    (CASE WHEN v > c[5] THEN 1 ELSE 0 END) + (CASE WHEN v > c[6] THEN 1 ELSE 0 END) +
             |    (CASE WHEN v > c[7] THEN 1 ELSE 0 END) + (CASE WHEN v > c[8] THEN 1 ELSE 0 END) +
             |    (CASE WHEN v > c[9] THEN 1 ELSE 0 END) AS bin
             |  FROM o CROSS JOIN cuts),
             |counts AS (
             |  SELECT bin,
             |    count(CASE WHEN is_ref THEN 1 END) AS n_ref,
             |    count(CASE WHEN NOT is_ref THEN 1 END) AS n_cur
             |  FROM binned GROUP BY bin),
             |tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts)
             |SELECT bin, n_ref, n_cur,
             |  round((CAST(n_cur + 1 AS DOUBLE) / (t_cur + 10)
             |         - CAST(n_ref + 1 AS DOUBLE) / (t_ref + 10))
             |    * ln((CAST(n_cur + 1 AS DOUBLE) / (t_cur + 10))
             |          / (CAST(n_ref + 1 AS DOUBLE) / (t_ref + 10))), 6) AS psi_contrib
             |FROM counts CROSS JOIN tot ORDER BY bin""".stripMargin),
      "Population Stability Index per decile bin (drift monitor, broadcast cutpoints)"),

    // Count-Min frequency sketch: ONE narrow pass folds the token stream
    // into a fixed 4×512 counter grid (typed Aggregator, map-side
    // combinable — 16 KB of state per partition regardless of vocabulary
    // size), then the top-20 exact tokens probe the broadcast sketch via
    // the declared-arithmetic estimate column (codegen, no UDF). CMS is
    // one-sided: est ≥ exact always, est ≤ exact + ε·N w.h.p. — the
    // oracle recomputes exact counts and gates both sides (ε = 1%). The
    // exact side exists to demonstrate the bound; the production consumer
    // is the sketch itself, which pre-aggregates per hour/day and rolls
    // up by counter addition like the HLL rollup.
    "agg_cms_freq" -> Q(
      (s, dir) => {
        import s.implicits._
        val keyed = table(s, dir, "documents")
          .select(explode(graft.ext.Dedup.tokens(col("text"))).as("t"))
          .withColumn("k",
            conv(substring(md5(col("t")), 1, 12), 16, 10).cast("long"))
        // the typed Buf flattens to (n, counters); re-struct for the join
        val sketch = keyed.select(col("k")).as[Long]
          .select(new graft.functions.CountMin.CmsAggregator().toColumn)
          .select(struct(col("n"), col("counters")).as("sk"))
        val probes = keyed.groupBy("t", "k").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("t")).limit(20)
        val scored = probes.crossJoin(broadcast(sketch))
          .select(col("t"), col("n"),
            graft.functions.CountMin.estimateColumn(col("sk.counters"), col("k"))
              .as("est"))
          .orderBy(desc("n"), asc("t"))
        OracleAux.persist(dir, "agg_cms_freq")(scored)
          .orderBy(desc("n"), asc("t"))
      },
      Some(s"""WITH out AS (
              |  SELECT * FROM read_parquet(${OracleAux.duckGlob("agg_cms_freq")})),
              |toks AS (
              |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
              |  FROM documents),
              |ex AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
              |tot AS (SELECT count(*) AS nt FROM toks)
              |SELECT o.t,
              |  CASE WHEN o.n = ex.n THEN o.n END AS n,
              |  CASE WHEN o.est >= ex.n
              |        AND o.est <= ex.n + CAST(ceil(0.01 * tot.nt) AS BIGINT)
              |       THEN o.est END AS est
              |FROM out o JOIN ex USING (t) CROSS JOIN tot
              |ORDER BY o.n DESC, o.t""".stripMargin),
      "Count-Min frequency sketch: one-pass 4×512 grid, broadcast point queries, ε·N-gated"),

    // Mergeable-sketch rollup: per-day HLL sketches of distinct users per
    // event type, unioned across days into the per-type total — the
    // two-level pre-aggregation every 100 TB distinct-count dashboard
    // runs (daily sketches are built once at ingest; ANY date-range
    // distinct is then a register-wise union of tiny sketches, never a
    // rescan). The estimate is oracle-GATED like agg_percentiles_approx:
    // DuckDB recomputes the exact distinct count and nulls the estimate
    // if it strays past 5% (HLL lgK=12 ⇒ ~1.6% expected); the day count
    // is compared exactly.
    "agg_hll_rollup" -> Q(
      (s, dir) => {
        val daily = Registry.events(s, dir)
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
        val rolled = daily.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false))
              .as("approx_users"))
        OracleAux.persist(dir, "agg_hll_rollup")(rolled)
          .orderBy("event_type")
      },
      Some(s"""WITH approx AS (
              |  SELECT * FROM read_parquet(${OracleAux.duckGlob("agg_hll_rollup")})),
              |exact AS (
              |  SELECT event_type, count(DISTINCT user_id) AS e,
              |    count(DISTINCT CAST(ts AS DATE)) AS nd
              |  FROM events GROUP BY 1)
              |SELECT a.event_type,
              |  CASE WHEN a.n_days = x.nd THEN a.n_days END AS n_days,
              |  CASE WHEN abs(a.approx_users - x.e) <= 0.05 * x.e
              |       THEN a.approx_users END AS approx_users
              |FROM approx a JOIN exact x ON a.event_type = x.event_type
              |ORDER BY a.event_type""".stripMargin),
      "two-level mergeable HLL rollup (daily sketches → per-type union)"),

    // Two-sample Kolmogorov–Smirnov: D = max_v |ECDF_en(v) − ECDF_rest(v)|
    // over document length — the distribution-shift test run when a new
    // crawl snapshot lands (does source X's length profile match the
    // corpus?). The cumulative sums run on the shared [[PrefixSum]]
    // two-level machinery (bucket totals → broadcast theta-join offsets →
    // bucket-PARTITIONED intra-cumsum — nothing unpartitioned). All
    // counts stay BIGINT until the final two divisions, so the gap
    // doubles are bit-identical across engines. The max probe is the
    // same single pruned-column scan pack_sequences documents.
    "stats_kstest" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val byV = docs
          .select(col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("a"))
          .groupBy("v").agg(sum("a").as("ca"), sum(lit(1L) - col("a")).as("cb"))
        val nn = byV.agg(sum("ca").as("na"), sum("cb").as("nb"))
        val gaps = graft.ext.PrefixSum
          .cumulative(byV, "v", Seq("ca", "cb"),
            bounds = Some((0.0, graft.ext.PrefixSum.maxBound(docs, "n_chars"))))
          .withColumnRenamed("cum_ca", "cuma")
          .withColumnRenamed("cum_cb", "cumb")
          .crossJoin(broadcast(nn))
          .withColumn("gap",
            abs(col("cuma").cast("double") / col("na")
              - col("cumb").cast("double") / col("nb")))
        gaps
          .agg(max(struct(col("gap").as("gap"), (-col("v")).as("nv"))).as("m"),
            max("na").as("na"), max("nb").as("nb"))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            round(col("m.gap"), 6).as("d_stat"),
            (-col("m.nv")).as("d_at_v"))
      },
      Some("""WITH d AS (
             |  SELECT n_chars AS v, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
             |  FROM documents),
             |byv AS (
             |  SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(1 - a) AS BIGINT) AS cb
             |  FROM d GROUP BY v),
             |nn AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM byv),
             |cum AS (
             |  SELECT v,
             |    CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
             |    CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
             |  FROM byv),
             |gaps AS (
             |  SELECT v, na, nb,
             |    abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb) AS gap
             |  FROM cum CROSS JOIN nn)
             |SELECT na AS n_a, nb AS n_b, round(gap, 6) AS d_stat, v AS d_at_v
             |FROM gaps ORDER BY gap DESC, v LIMIT 1""".stripMargin),
      "two-sample Kolmogorov–Smirnov over doc length (en vs rest), two-level prefix-sum CDFs"),

    // Chi-squared test of independence, lang × source — the categorical
    // drift check beside stats_kstest's continuous one (is a source's
    // language mix what the corpus predicts?). ONE corpus aggregate to
    // the contingency cells; margins, total, and the full grid (including
    // empty cells — the test is over the whole table) all derive from
    // that tiny frame via broadcast joins. Per-cell output, no global
    // double sum: expected counts are exact fixed-point BIGINT
    // ((r·c·10^6) div N) and each contribution (o−e)²/e is ONE double
    // expression over exact integer inputs — deterministic across
    // engines, PSI-style. At harness scales every intermediate fits
    // BIGINT and r·c·N < 2^53 (doubles exact); at 10^12 docs the products
    // move to DECIMAL(38,0).
    "stats_chisq" -> Q(
      (s, dir) => {
        val counts = table(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val r = counts.groupBy("lang").agg(sum("o").as("r"))
        val c = counts.groupBy("source").agg(sum("o").as("c"))
        val n = counts.agg(sum("o").as("n"))
        val grid = r.crossJoin(broadcast(c)).crossJoin(broadcast(n))
          .join(broadcast(counts), Seq("lang", "source"), "left")
          .withColumn("obs", coalesce(col("o"), lit(0L)))
        val d = (col("obs") * col("n") - col("r") * col("c")).cast("double")
        grid.select(col("lang"), col("source"), col("obs"),
            expr("(r * c * 1000000) div n").as("exp6"),
            round(d * d / (col("r") * col("c") * col("n")).cast("double"), 6)
              .as("contrib"))
          .orderBy("lang", "source")
      },
      Some("""WITH counts AS (
             |  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source),
             |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM counts GROUP BY lang),
             |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM counts GROUP BY source),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM counts),
             |grid AS (
             |  SELECT r.lang, c.source, coalesce(k.o, 0) AS obs, r.r, c.c, n.n
             |  FROM r CROSS JOIN c CROSS JOIN n
             |  LEFT JOIN counts k ON k.lang = r.lang AND k.source = c.source)
             |SELECT lang, source, CAST(obs AS BIGINT) AS obs,
             |  CAST((r * c * 1000000) // n AS BIGINT) AS exp6,
             |  round(CAST(obs*n - r*c AS DOUBLE) * CAST(obs*n - r*c AS DOUBLE)
             |        / CAST(r*c*n AS DOUBLE), 6) AS contrib
             |FROM grid ORDER BY lang, source""".stripMargin),
      "chi-squared independence cells (lang × source): exact fixed-point expected, per-cell contribution"),

    // Two-sample Mann–Whitney U (rank-sum) over document length, en vs
    // rest — the nonparametric companion to stats_kstest on the SAME
    // contrast: KS's D says whether the two length distributions differ
    // anywhere; U says which one stochastically dominates and by how
    // much. Rank arithmetic needs no global sort: in doubled units
    // 2·U_A = Σ_v ca(v)·(2·CB<(v) + cb(v)) over distinct values
    // (v, ca, cb), and the strictly-below counts CB< come from the same
    // two-level prefix sum stats_kstest uses (1024 fixed range buckets:
    // broadcast theta-join for bucket offsets, bucket-PARTITIONED window
    // inside — nothing unpartitioned). Everything stays exact BIGINT —
    // u2_a and the tie term fit int64 up to ~10^9 rows per group; past
    // that the pair products move to DECIMAL(38,0), chisq-style. The
    // tie-corrected normal z is ONE double expression over those exact
    // integers, shared verbatim with the twin (guarded total: zero-size
    // groups and the all-tied σ=0 case yield NULL, not an error).
    "stats_mannwhitney" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val byV = docs
          .select(col("n_chars").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("a"))
          .groupBy("v").agg(sum("a").as("ca"), sum(lit(1L) - col("a")).as("cb"))
        // single-scalar probe, kstest-style (adjudicated acceptable)
        val cum = graft.ext.PrefixSum
          .cumulative(byV, "v", Seq("cb"),
            bounds = Some((0.0, graft.ext.PrefixSum.maxBound(docs, "n_chars"))))
          .withColumnRenamed("cum_cb", "cumb")
        cum.agg(
            sum("ca").as("na"), sum("cb").as("nb"),
            sum(col("ca") * (lit(2L) * (col("cumb") - col("cb")) + col("cb")))
              .as("u2a"),
            sum((col("ca") + col("cb")) * (col("ca") + col("cb"))
              * (col("ca") + col("cb")) - (col("ca") + col("cb"))).as("tt"))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            col("u2a").as("u2_a"), col("tt").as("tie_cubes"),
            expr(mwuZ).as("z"))
      },
      Some(s"""WITH d AS (
              |  SELECT n_chars AS v, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
              |  FROM documents),
              |byv AS (
              |  SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(1 - a) AS BIGINT) AS cb
              |  FROM d GROUP BY v),
              |cum AS (
              |  SELECT v, ca, cb,
              |    CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
              |  FROM byv),
              |agg AS (
              |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
              |    CAST(sum(ca * (2 * (cumb - cb) + cb)) AS BIGINT) AS u2a,
              |    CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT) AS tt
              |  FROM cum)
              |SELECT na AS n_a, nb AS n_b, u2a AS u2_a, tt AS tie_cubes,
              |  $mwuZ AS z
              |FROM agg""".stripMargin),
      "two-sample Mann-Whitney U over doc length (en vs rest), window-free doubled-unit rank sums"),

    // Poisson bootstrap CI for the mean purchase value — the bootstrap
    // that scales. Classic resampling draws n indices per replicate (a
    // global shuffle per replicate); the Poisson(1) approximation
    // instead gives every row an independent per-replicate count, so all
    // B=48 replicates run in ONE narrow pass: explode by B, per-replicate
    // combinable sums, a 48-row final fold. Counts come from a
    // seed-salted md5 uniform pushed through fixed ppm thresholds (the
    // cumulative Poisson(1) mass, capped at 7 where the remaining tail is
    // <8.4e-5 — the cap is applied identically in both engines, so
    // comparisons stay exact). Values are fixed-pointed to micro-units
    // BEFORE summing (floor(v·1e6+0.5); round() half-case semantics
    // differ across engines, floor does not), so every replicate mean is
    // an exact integer and the CI bounds are exact order statistics
    // (2nd / 47th of 48 ≈ the 95% percentile interval) — no float
    // summation anywhere in the compared output.
    "stats_bootstrap" -> Q(
      (s, dir) => {
        val purchases = table(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v6"))
        val reps = purchases
          .select(col("event_id"), col("v6"),
            explode(sequence(lit(0), lit(bootB - 1))).as("rep"))
          .withColumn("h", md5(concat(col("event_id").cast("string"),
            lit(":"), col("rep").cast("string"), lit("#boot42"))))
          .withColumn("uval", graft.ext.Shards.hexPrefixVal(col("h"), 6))
          .withColumn("u", expr("uval * 1000000 DIV 16777216"))
          .withColumn("cnt", expr(poissonCnt))
          .groupBy("rep")
          .agg(sum(col("cnt") * col("v6")).as("wsum"), sum("cnt").as("wn"))
          .filter(col("wn") > 0)
          .withColumn("mean6", expr("wsum DIV wn"))
        val point = purchases.agg(count(lit(1)).as("n_rows"),
          sum("v6").as("tot6"))
        reps.agg(count(lit(1)).as("n_reps"),
            expr("CASE WHEN count(1) >= 3 THEN element_at(array_sort(collect_list(mean6)), 2) END")
              .as("lo6"),
            expr("CASE WHEN count(1) >= 3 THEN element_at(array_sort(collect_list(mean6)), CAST(count(1) AS INT) - 1) END")
              .as("hi6"))
          .crossJoin(broadcast(point))
          .filter(col("n_rows") > 0)
          .select(col("n_rows"), expr("tot6 DIV n_rows").as("mean6"),
            col("n_reps"), col("lo6").as("boot_lo6"), col("hi6").as("boot_hi6"))
      },
      Some(s"""WITH p AS (
              |  SELECT event_id, CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v6
              |  FROM events WHERE event_type = 'purchase'),
              |reps AS (
              |  SELECT event_id, v6, unnest(range($bootB)) AS rep FROM p),
              |hh AS (
              |  SELECT v6, rep,
              |    md5(CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR) || '#boot42') AS h
              |  FROM reps),
              |uu AS (
              |  SELECT v6, rep, (($bootUTermsSql) * 1000000) // 16777216 AS u FROM hh),
              |cc AS (SELECT rep, v6, $poissonCnt AS cnt FROM uu),
              |m AS (
              |  SELECT rep, CAST(sum(cnt * v6) AS BIGINT) AS wsum,
              |    CAST(sum(cnt) AS BIGINT) AS wn
              |  FROM cc GROUP BY rep),
              |mm AS (SELECT rep, wsum // wn AS mean6 FROM m WHERE wn > 0),
              |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
              |         CAST(sum(v6) AS BIGINT) AS tot6 FROM p),
              |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_reps,
              |         CASE WHEN count(*) >= 3
              |              THEN list_extract(list_sort(list(mean6)), 2) END AS lo6,
              |         CASE WHEN count(*) >= 3
              |              THEN list_extract(list_sort(list(mean6)), CAST(count(*) AS INT) - 1) END AS hi6
              |       FROM mm)
              |SELECT n_rows, tot6 // n_rows AS mean6, n_reps,
              |  lo6 AS boot_lo6, hi6 AS boot_hi6
              |FROM ci CROSS JOIN pt WHERE n_rows > 0""".stripMargin),
      "Poisson bootstrap 95% CI for mean purchase value: B=48 replicates in one narrow pass, exact micro-unit order statistics"),

    // One-way ANOVA F over document length across sources — the k-group
    // generalization closing the hypothesis-test family (abtest = 2-group
    // means, mannwhitney/kstest = 2-group distributions, chisq =
    // categorical): "does ANY source produce systematically different
    // document lengths?" is the screen run before drilling into pairwise
    // contrasts. Everything up to the final F is exact integer
    // arithmetic: per-group (n_g, Σx, Σx²) are combinable int64 sums, the
    // between/within sums of squares are micro-unit fixed point
    // (q6_g = ⌊Σx_g²·10⁶ / n_g⌋ — floor division, identical in both
    // engines, per-group error < 1 micro-unit) in DECIMAL(38,0)/HUGEINT.
    // The floor divisions stay in DECIMAL via the remainder identity
    // ⌊a/b⌋ = (a − a % b)/b — SQL `div` returns int64 and its QUOTIENT
    // (~n_g·mean²·10⁶) overflows long at ~9M docs/source, far below
    // target scale; the DECIMAL form is exact until Σx_g²·10⁶ passes
    // 10³⁸ (≈3·10¹⁵ chars in one source), where ANSI raises loudly.
    // ssb6 is clamped at 0 in both engines: per-group flooring can push
    // the subtraction to ≈ −k micro-units when true between-group
    // variance is 0, and a negative F/η² is mathematically impossible.
    // Only float math: the final F / η² expression. Plan: ONE map-side-
    // combinable groupBy over the scan, then a second agg over k rows —
    // no window, no join; at 100 TB this is a single shuffle of k
    // source-rows.
    "stats_anova" -> Q(
      (s, dir) => {
        val g = table(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("ng"),
            sum("n_chars").as("sg"),
            sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("qg"))
          .withColumn("a6", expr("CAST(sg AS DECIMAL(38,0)) * sg * 1000000"))
          .withColumn("q6g", expr("CAST((a6 - a6 % ng) / ng AS DECIMAL(38,0))"))
        g.agg(count(lit(1)).as("k"), sum("ng").as("n"),
            sum("sg").as("stot"), sum("qg").as("qtot"),
            sum("q6g").as("qb"))
          .withColumn("b6", expr("CAST(stot AS DECIMAL(38,0)) * stot * 1000000"))
          .withColumn("ssb6",
            expr("greatest(qb - CAST((b6 - b6 % n) / n AS DECIMAL(38,0)), 0)"))
          .withColumn("ssw6", expr("qtot * 1000000 - qb"))
          .select(col("k").cast("long").as("k"), col("n").cast("long").as("n"),
            expr("(CAST(stot AS DECIMAL(38,0)) * 10000) div n").cast("long")
              .as("mean4"),
            expr(anovaF).as("f_stat"),
            expr("""CASE WHEN ssb6 + ssw6 > 0
                   |     THEN round(CAST(ssb6 AS DOUBLE)
                   |          / CAST(ssb6 + ssw6 AS DOUBLE), 6) END""".stripMargin)
              .as("eta_sq"))
      },
      Some(s"""WITH g AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS ng,
              |    CAST(sum(n_chars) AS BIGINT) AS sg,
              |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS qg,
              |    (CAST(sum(n_chars) AS HUGEINT) * CAST(sum(n_chars) AS BIGINT)
              |       * 1000000) // CAST(count(*) AS BIGINT) AS q6g
              |  FROM documents GROUP BY source),
              |t AS (
              |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
              |    CAST(sum(sg) AS BIGINT) AS stot, sum(qg) AS qtot,
              |    sum(q6g) AS qb
              |  FROM g),
              |ss AS (
              |  SELECT k, n, stot,
              |    greatest(qb - (CAST(stot AS HUGEINT) * stot * 1000000) // n,
              |             0) AS ssb6,
              |    qtot * 1000000 - qb AS ssw6
              |  FROM t)
              |SELECT k, n, CAST((CAST(stot AS HUGEINT) * 10000) // n AS BIGINT) AS mean4,
              |  $anovaF AS f_stat,
              |  CASE WHEN ssb6 + ssw6 > 0
              |       THEN round(CAST(ssb6 AS DOUBLE)
              |            / CAST(ssb6 + ssw6 AS DOUBLE), 6) END AS eta_sq
              |FROM ss""".stripMargin),
      "one-way ANOVA F across sources: exact micro-unit sums of squares, one combinable shuffle"),

    // Lag-k autocorrelation of the daily event-count series, per event
    // type — the seasonality/trend diagnostic behind every ingest-volume
    // monitor (lag 1 = day-over-day persistence, lag 7 = weekly cycle;
    // a pipeline alerting on raw counts without knowing its lag-7
    // structure pages on every weekend). Two stages, both tiny after the
    // first: ONE combinable (type, day) count aggregation over the scan —
    // the only data-sized shuffle — then self-joins of the k·365-row/yr
    // daily series on (type, day+lag) and a Pearson r from exact integer
    // pair sums (Σa, Σb, Σab, Σa², Σb² over int64 daily counts). No
    // window functions; the lag alignment is an equi-join so the series
    // never needs a global sort. NULL r when a series is constant
    // (zero variance) — guarded identically in both engines.
    "stats_autocorr" -> Q(
      (s, dir) => {
        val daily = Registry.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val lags = Seq(1, 7).map(l => (lit(l).as("lag"), l))
        val legs = lags.map { case (lagCol, l) =>
          daily.as("a")
            .join(daily.as("b"),
              col("a.event_type") === col("b.event_type") &&
                col("b.d") === date_add(col("a.d"), l))
            .select(col("a.event_type").as("event_type"), lagCol,
              col("a.c").as("ca"), col("b.c").as("cb"))
        }
        legs.reduce(_ unionAll _)
          .groupBy("event_type", "lag")
          .agg(count(lit(1)).as("np"),
            sum("ca").as("sa"), sum("cb").as("sb"),
            sum(expr("ca * cb")).as("sab"),
            sum(expr("ca * ca")).as("saa"),
            sum(expr("cb * cb")).as("sbb"))
          .select(col("event_type"), col("lag"), col("np").as("n_pairs"),
            expr(pearsonR).as("r"))
          .orderBy("event_type", "lag")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS d,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM events GROUP BY 1, 2),
              |pairs AS (
              |  SELECT a.event_type, l.lag, a.c AS ca, b.c AS cb
              |  FROM daily a
              |  JOIN (SELECT 1 AS lag UNION ALL SELECT 7) l ON true
              |  JOIN daily b ON b.event_type = a.event_type
              |    AND b.d = a.d + CAST(l.lag AS INTEGER)),
              |m AS (
              |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS np,
              |    CAST(sum(ca) AS BIGINT) AS sa, CAST(sum(cb) AS BIGINT) AS sb,
              |    CAST(sum(ca * cb) AS BIGINT) AS sab,
              |    CAST(sum(ca * ca) AS BIGINT) AS saa,
              |    CAST(sum(cb * cb) AS BIGINT) AS sbb
              |  FROM pairs GROUP BY 1, 2)
              |SELECT event_type, lag, np AS n_pairs, $pearsonR AS r
              |FROM m ORDER BY event_type, lag""".stripMargin),
      "lag-1/lag-7 autocorrelation of daily event counts: equi-join lag alignment, exact integer pair sums"),

    // CUSUM changepoint detection over the daily event-count series, per
    // event type — the sequential drift detector (Page 1954) behind
    // ingest-volume monitors: PSI/KS compare two frozen windows, CUSUM
    // flags WHEN a sustained shift starts. The textbook recursion
    // S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − μ − κ) is not a combinable aggregate, but
    // it has the exact closed form S⁺ᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ) over
    // the prefix sums Pᵢ of (xᵢ − μ − κ) — two stacked window passes
    // (prefix sum, running min) on the SAME type-partitioned frame, so
    // the whole detector is one WindowExec over the tiny (type, day)
    // series. Everything is exact int64 micro-units: μ6 = ⌊Σc·10⁶/n⌋,
    // slack κ = μ/20 (5% of level), and the alarm threshold h = 5σ under
    // the Poisson count model (σ² = μ) compares S² against 25·μ6·10⁶ in
    // DECIMAL(38,0)/HUGEINT so no sqrt ever runs. Plan: ONE combinable
    // (type, day) count over the scan is the only data-sized shuffle;
    // the window state is |days| rows per type. CusumSpec pins the
    // closed form against the scalar recursion and a planted level
    // shift. */
    "stats_cusum" -> Q(
      (s, dir) => cusum(Registry.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))),
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |m AS (
             |  SELECT event_type, d, c,
             |    (sum(c) OVER (PARTITION BY event_type) * 1000000)
             |      // count(*) OVER (PARTITION BY event_type) AS mu6
             |  FROM daily),
             |k AS (SELECT event_type, d, c, mu6,
             |        c * 1000000 - mu6 - (mu6 // 20) AS dp,
             |        mu6 - c * 1000000 - (mu6 // 20) AS dn
             |      FROM m),
             |p AS (SELECT event_type, d, c, mu6,
             |        sum(dp) OVER w AS pp, sum(dn) OVER w AS pn
             |      FROM k WINDOW w AS (PARTITION BY event_type ORDER BY d
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |sfin AS (SELECT event_type, d, c, mu6,
             |        pp - least(0, min(pp) OVER w) AS sp,
             |        pn - least(0, min(pn) OVER w) AS sn
             |      FROM p WINDOW w AS (PARTITION BY event_type ORDER BY d
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_type, d, c,
             |  CAST(sp AS BIGINT) AS cusum_pos6, CAST(sn AS BIGINT) AS cusum_neg6,
             |  (CAST(sp AS HUGEINT) * sp > CAST(mu6 AS HUGEINT) * 25000000
             |   OR CAST(sn AS HUGEINT) * sn > CAST(mu6 AS HUGEINT) * 25000000) AS alarm
             |FROM sfin ORDER BY event_type, d""".stripMargin),
      "two-sided CUSUM drift detector: closed-form prefix-sum/running-min windows, exact micro-units"),

    // Forecast-baseline evaluation over the daily event-count series —
    // the calibration read behind volume alerting: before a monitor
    // compares today's ingest to "expected", measure how predictable the
    // series even IS under the two standard no-model baselines (naive =
    // yesterday, seasonal-naive = same weekday last week; Hyndman's
    // forecasting-practice floor — any real model must beat these).
    // Per (type, baseline): MAE and sMAPE in exact fixed point — per-day
    // absolute errors are integers, the sMAPE ratio 2·|e|·10⁶/(c+pred)
    // floors identically in both engines (c+pred ≥ 2: both legs are
    // existing daily counts), and only display scaling remains. Plan:
    // ONE combinable (type, day) count over the scan, then equi-join lag
    // alignment on the tiny daily series (the stats_autocorr shape — no
    // window, no global sort) and a |types|·2-row rollup.
    "events_forecast_eval" -> Q(
      (s, dir) => forecastEval(Registry.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))),
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |legs AS (
             |  SELECT a.event_type, l.model, a.c, b.c AS pred
             |  FROM daily a
             |  JOIN (SELECT 1 AS lag, 'naive' AS model
             |        UNION ALL SELECT 7, 'seasonal') l ON true
             |  JOIN daily b ON b.event_type = a.event_type
             |    AND a.d = b.d + CAST(l.lag AS INTEGER))
             |SELECT event_type, model, CAST(count(*) AS BIGINT) AS n_days,
             |  CAST((sum(abs(c - pred)) * 1000000) // count(*) AS BIGINT) AS mae6,
             |  CAST(sum((abs(c - pred) * 2000000) // (c + pred))
             |       // count(*) AS BIGINT) AS smape6
             |FROM legs GROUP BY 1, 2 ORDER BY event_type, model""".stripMargin),
      "naive/seasonal-naive forecast baseline eval: exact fixed-point MAE + sMAPE per type"))

  /** Forecast-baseline eval over any (event_type, d, c) daily series —
    * exposed for the hand-fixture spec. */
  private[graft] def forecastEval(daily: DataFrame): DataFrame = {
    val legs = Seq(1 -> "naive", 7 -> "seasonal").map { case (l, m) =>
      daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.d") === date_add(col("b.d"), l))
        .select(col("a.event_type").as("event_type"), lit(m).as("model"),
          col("a.c").as("c"), col("b.c").as("pred"))
    }
    legs.reduce(_ unionAll _)
      .withColumn("ae", abs(col("c") - col("pred")))
      .groupBy("event_type", "model")
      .agg(count(lit(1)).as("n_days"),
        expr("(sum(ae) * 1000000) div count(*)").as("mae6"),
        expr("sum((ae * 2000000) div (c + pred)) div count(*)").as("smape6"))
      .orderBy("event_type", "model")
  }

  /** CUSUM over any (event_type, d, c) daily series — exposed for the
    * recursion-equivalence and planted-shift specs. The retrospective
    * form: μ6 is the series' OWN fixed-point mean per type, attached via
    * one partitioned window, then the shared arithmetic core
    * ([[graft.ext.Monitor.cusumCore]] — verbatim the expression the
    * streaming ingest monitor runs, so batch/stream parity holds by
    * construction). */
  private[graft] def cusum(daily: DataFrame): DataFrame =
    graft.ext.Monitor.cusumCore(
      daily.withColumn("mu6", expr(
        "(sum(c) OVER (PARTITION BY event_type) * 1000000)" +
          " div count(*) OVER (PARTITION BY event_type)")))
      .orderBy("event_type", "d")

  /** Replicate count for [[stats_bootstrap]] — fixed so the CI's order
    * statistics (2nd/47th) are well-defined constants in both engines. */
  private def bootB: Int = 48

  /** Final float expression for [[stats_anova]] — F over the exact
    * micro-unit sums of squares (the 10⁶ scales cancel in the ratio);
    * NULL (never an error) for degenerate designs: one group, no
    * residual degrees of freedom, or zero within-group variance. */
  private def anovaF: String =
    """CASE WHEN k > 1 AND n > k AND ssw6 > 0
      |     THEN round((CAST(ssb6 AS DOUBLE) * CAST(n - k AS DOUBLE))
      |          / (CAST(ssw6 AS DOUBLE) * CAST(k - 1 AS DOUBLE)), 6)
      |     END""".stripMargin

  /** Final float expression for [[stats_autocorr]] — Pearson r over the
    * exact integer pair sums; NULL when either margin is constant. */
  private def pearsonR: String =
    """CASE WHEN np > 1 AND np * saa > sa * sa AND np * sbb > sb * sb
      |     THEN round((CAST(np AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
      |          / sqrt((CAST(np AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
      |               * (CAST(np AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)), 6)
      |     END""".stripMargin

  /** Inverse-CDF Poisson(1) counts from an integer ppm uniform `u` —
    * thresholds are floor(1e6 · P(X ≤ k)) for k = 0..6, tail capped at 7
    * (mass 8.4e-5); identical text in both engines. */
  private def poissonCnt: String =
    "CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1 WHEN u < 919698 THEN 2 " +
      "WHEN u < 981011 THEN 3 WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5 " +
      "WHEN u < 999916 THEN 6 ELSE 7 END"

  /** DuckDB text of the 24-bit hex-prefix integer (the [[graft.ext.Shards.hexVal]]
    * arithmetic, mirrored verbatim by the Spark side's Column build). */
  private def bootUTermsSql: String =
    (1 to 6).map { i =>
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}"
    }.mkString(" + ")

  /** Tie-corrected normal approximation for the Mann–Whitney z, over the
    * exact integer aggregates (na, nb, u2a = 2·U_A, tt = Σ t³−t). One
    * double expression with identical text in both engines; NULL (never
    * an error) when a group is empty or every value is tied (σ = 0 ⟺
    * tt = n³−n). n³ here fits int64 up to n ≈ 2.6·10^6 docs in the
    * guard's integer compare — past that, lift the guard to
    * DECIMAL(38,0)/HUGEINT with the other pair products. */
  private def mwuZ: String =
    """CASE WHEN na > 0 AND nb > 0 AND na + nb > 1
      |       AND tt < (na + nb) * (na + nb) * (na + nb) - (na + nb)
      |     THEN round((CAST(u2a AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
      |          / (2.0 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |              * ((CAST(na + nb AS DOUBLE) + 1.0)
      |                 - CAST(tt AS DOUBLE)
      |                   / (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0)))
      |              / 12.0)), 6)
      |     END""".stripMargin
}
