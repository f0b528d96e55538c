package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Indexing, Mining, Multimodal, Sessionize, Similarity, TextStats, Upsert}
import graft.queries.ExtQueries._
import graft.queries.Registry.{events, table}

/** Analytics/governance operators split out of [[ExtQueries]]:
  * curation pipeline + attrition, packing, corpus mixing/sampling,
  * privacy, forecasting, survival, anomaly scoring. */
object ExtAnalyticsQueries {

  val all: Map[String, Q] = Map(
    // ---------------------------------------------------------- analytics
    "events_funnel" -> Q(
      (s, dir) => graft.ext.Analytics.funnel(events(s, dir)),
      Some("""WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS v_us
             |      FROM base GROUP BY user_id),
             |c AS (SELECT b.user_id, v.v_us,
             |        min(CASE WHEN b.event_type = 'click' AND b.us > v.v_us THEN b.us END) AS c_us
             |      FROM base b JOIN v ON b.user_id = v.user_id GROUP BY b.user_id, v.v_us),
             |p AS (SELECT b.user_id, c.v_us, c.c_us,
             |        min(CASE WHEN b.event_type = 'purchase' AND b.us > c.c_us THEN b.us END) AS p_us
             |      FROM base b JOIN c ON b.user_id = c.user_id GROUP BY b.user_id, c.v_us, c.c_us)
             |SELECT count(*) AS n_users, count(v_us) AS n_view,
             |  count(c_us) AS n_view_click, count(p_us) AS n_full_funnel
             |FROM p""".stripMargin),
      "ordered funnel conversion (view → click → purchase)"),

    // Conversion-window funnel: each step must land within 24 hours of
    // the previous step — the default semantics of every product-analytics
    // funnel (unbounded credit is a reporting bug, not a feature; 24 h
    // fits this corpus's step-gap distribution, median ~33 h). Same
    // one-Exchange user-keyed window pass as events_funnel.
    "events_funnel_windowed" -> Q(
      (s, dir) => graft.ext.Analytics.funnelWindowed(events(s, dir),
        maxGapUs = 24L * 3600 * 1000000),
      Some("""WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS v_us
             |      FROM base GROUP BY user_id),
             |c AS (SELECT b.user_id, v.v_us,
             |        min(CASE WHEN b.event_type = 'click' AND b.us > v.v_us
             |                  AND b.us <= v.v_us + 86400000000 THEN b.us END) AS c_us
             |      FROM base b JOIN v ON b.user_id = v.user_id GROUP BY b.user_id, v.v_us),
             |p AS (SELECT b.user_id, c.v_us, c.c_us,
             |        min(CASE WHEN b.event_type = 'purchase' AND b.us > c.c_us
             |                  AND b.us <= c.c_us + 86400000000 THEN b.us END) AS p_us
             |      FROM base b JOIN c ON b.user_id = c.user_id GROUP BY b.user_id, c.v_us, c.c_us)
             |SELECT count(*) AS n_users, count(v_us) AS n_view,
             |  count(c_us) AS n_view_click, count(p_us) AS n_full_funnel
             |FROM p""".stripMargin),
      "conversion-window funnel (every step within 24 h of the previous)"),

    // Sequence-pattern mining — the MATCH_RECOGNIZE / funnel-regex
    // equivalent: each user's event history collapses to an ordered
    // initial-letter string (c/e/p/s/v, all distinct here), and fixed
    // regex patterns count matches over it. One user-keyed aggregation;
    // per-user state is the user's OWN event count (the same bound every
    // sequence operator here carries — production caps it with a
    // retention window). Patterns stay in the Java∩RE2 common subset;
    // both engines count non-overlapping matches left-to-right.
    "events_pattern_match" -> Q(
      (s, dir) => {
        val e = events(s, dir).select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ini"))
        val seqs = e.groupBy("user_id").agg(
          array_join(transform(
            array_sort(collect_list(struct(col("us"), col("event_id"), col("ini")))),
            x => x.getField("ini")), "").as("seq"))
        // strict view-click-purchase; conversion with detours; error bursts
        val pats = Seq("vcp", "v[ces]*p", "e{2,}")
        val aggCols = pats.zipWithIndex.map { case (p, i) =>
          sum(regexp_count(col("seq"), lit(p))).as(s"o$i")
        } ++ pats.zipWithIndex.map { case (p, i) =>
          count(when(regexp_count(col("seq"), lit(p)) > 0, 1)).as(s"u$i")
        }
        seqs.agg(aggCols.head, aggCols.tail: _*)
          .select(expr(
            s"""stack(${pats.size}, ${pats.zipWithIndex.map { case (p, i) =>
              s"'$p', o$i, u$i" }.mkString(", ")})
               |AS (pattern, n_matches, n_users)""".stripMargin))
          .orderBy("pattern")
      },
      Some("""WITH seq AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY epoch_us(ts), event_id) AS s
             |  FROM events GROUP BY user_id),
             |m AS (SELECT
             |  CAST(sum(len(regexp_extract_all(s, 'vcp'))) AS BIGINT) AS o0,
             |  CAST(sum(len(regexp_extract_all(s, 'v[ces]*p'))) AS BIGINT) AS o1,
             |  CAST(sum(len(regexp_extract_all(s, 'e{2,}'))) AS BIGINT) AS o2,
             |  count(CASE WHEN len(regexp_extract_all(s, 'vcp')) > 0 THEN 1 END) AS u0,
             |  count(CASE WHEN len(regexp_extract_all(s, 'v[ces]*p')) > 0 THEN 1 END) AS u1,
             |  count(CASE WHEN len(regexp_extract_all(s, 'e{2,}')) > 0 THEN 1 END) AS u2
             |  FROM seq)
             |SELECT * FROM (
             |  SELECT 'vcp' AS pattern, o0 AS n_matches, u0 AS n_users FROM m
             |  UNION ALL SELECT 'v[ces]*p', o1, u1 FROM m
             |  UNION ALL SELECT 'e{2,}', o2, u2 FROM m)
             |ORDER BY pattern""".stripMargin),
      "sequence-pattern mining over per-user event strings (MATCH_RECOGNIZE equivalent)"),

    "events_cohort" -> Q(
      (s, dir) => graft.ext.Analytics.cohortRetention(events(s, dir)),
      Some("""WITH activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |cohorts AS (SELECT user_id, min(d) AS cohort_d FROM activity GROUP BY user_id)
             |SELECT cohort_d,
             |  CAST(date_diff('day', cohort_d, d) AS INTEGER) AS day_offset,
             |  count(DISTINCT a.user_id) AS n_active
             |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
             |WHERE date_diff('day', cohort_d, d) <= 7
             |GROUP BY 1, 2 ORDER BY cohort_d, day_offset""".stripMargin),
      "cohort retention (first-seen day × active-day offsets)"),

    // Windowed anomaly detection: hourly volume per event type, flagging
    // hours beyond 2σ of that type's mean — the monitoring query every
    // ingest pipeline runs. One groupBy + one unordered per-type window
    // (whole-partition frame); event-type cardinality is tiny, so the
    // window state is bounded regardless of corpus size.
    "events_anomaly" -> Q(
      (s, dir) => {
        val hourly = events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
        hourly
          .withColumn("mu", avg(col("n")).over(w))
          .withColumn("sigma", stddev_pop(col("n")).over(w))
          .filter(col("sigma") > 0 &&
            abs(col("n") - col("mu")) > lit(2.0) * col("sigma"))
          .select(unix_micros(col("h")).as("h_us"), col("event_type"), col("n"),
            round((col("n") - col("mu")) / col("sigma"), 4).as("z"))
          .orderBy("h_us", "event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |st AS (
             |  SELECT h, event_type, n,
             |    avg(n) OVER (PARTITION BY event_type) AS mu,
             |    stddev_pop(n) OVER (PARTITION BY event_type) AS sigma
             |  FROM hourly)
             |SELECT epoch_us(h) AS h_us, event_type, n,
             |  round((n - mu) / sigma, 4) AS z
             |FROM st WHERE sigma > 0 AND abs(n - mu) > 2 * sigma
             |ORDER BY h_us, event_type""".stripMargin),
      "hourly-volume anomaly detection: per-type 2-sigma z-score outliers"),

    "events_gapfill" -> Q(
      (s, dir) => graft.ext.Analytics.gapFillForwardFill(events(s, dir)),
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h, event_type, round(sum(value), 2) AS rev
             |  FROM events GROUP BY 1, 2),
             |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events),
             |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
             |grid AS (SELECT h, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)),
             |joined AS (SELECT g.h, g.event_type, rev FROM grid g
             |           LEFT JOIN hourly USING (h, event_type))
             |SELECT h, event_type,
             |  coalesce(rev, last_value(rev IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_filled
             |FROM joined ORDER BY h, event_type""".stripMargin),
      "date-spine gap filling with forward fill (sequence + window last)"),

    // Token-budget sequence sharding — the pre-training packing step:
    // documents stream into ~budget-token shards. The running token count
    // is per-language, but a plain per-lang window caps parallelism at
    // the language count (5 here — a 100 TB scale-killer: each language's
    // whole corpus would serialize through one task). The scale-safe
    // two-level prefix sum lives in [[packCumStart]], shared with
    // pack_budget_sweep.
    "pack_sequences" -> Q(
      (s, dir) => {
        val budget = 8192
        packCumStart(s, dir)
          .withColumn("bin", (col("cum_start") / budget).cast("long"))
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
          .orderBy("lang", "bin")
      },
      Some("""WITH toks AS (
             |  SELECT lang, doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
             |  FROM documents),
             |binned AS (
             |  SELECT lang, toks,
             |    CAST(floor(coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 8192) AS BIGINT) AS bin
             |  FROM toks)
             |SELECT lang, bin, count(*) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS total_tokens
             |FROM binned GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin),
      "token-budget sequence sharding (per-language partitioned cumsum bins)"),

    // Per-source corpus audit — the data-source breakdown every curation
    // run starts from (which sources contribute how many tokens, and how
    // duplicate-ridden is each): docs, exact token totals, language
    // spread, and the within-source exact-duplicate rate via fingerprint
    // distinct-count. One scan-speed groupBy on the source key; all
    // counters are integer-exact so the rollup is order-invariant, and
    // the single dup_rate division is the only double (deterministic
    // cross-engine, same contract as the stats family).
    "corpus_source_audit" -> Q(
      (s, dir) => table(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextStats.wsTokenCount(col("text")).cast("long")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dup"))
        .withColumn("dup_rate",
          round(col("n_exact_dup").cast("double") / col("n_docs").cast("double"), 4))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dup,
             |  round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
             |        / CAST(count(*) AS DOUBLE), 4) AS dup_rate
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      "per-source corpus audit: docs, exact token/char totals, language spread, exact-dup rate"),

    // Deterministic corpus split — train/val/test by a stable key function
    // (never rand(): reruns and engines must agree). Narrow map + one agg.
    "corpus_split" -> Q(
      (s, dir) => table(s, dir, "documents")
        .withColumn("split",
          when(col("doc_id") % 100 < 90, "train")
            .when(col("doc_id") % 100 < 95, "val")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextStats.wsTokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy("lang", "split"),
      Some("""SELECT lang,
             |  CASE WHEN doc_id % 100 < 90 THEN 'train'
             |       WHEN doc_id % 100 < 95 THEN 'val' ELSE 'test' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
             |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin),
      "deterministic train/val/test corpus split with per-split token counts"),

    // Context-length chunking — the pre-tokenization split of long
    // documents into fixed token windows (stride = window here; an
    // overlapped stride is the same shape with a second explode). One
    // posexplode + one (doc, chunk)-keyed aggregation; the per-chunk md5
    // fingerprint pins content identity, not just counts. The per-chunk
    // array_sort/transform run interpreted but once per CHUNK row over
    // ≤128 elements — the fine-per-row side of the HOF tradeoff.
    "text_chunk" -> Q(
      (s, dir) => {
        val chunkSize = 128
        val tok = table(s, dir, "documents").select(col("doc_id"),
          posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "t")))
        val ordered = transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))
        tok.withColumn("chunk_id", (col("pos") / chunkSize).cast("long"))
          .groupBy("doc_id", "chunk_id")
          .agg(count(lit(1)).as("n_tokens"),
            md5(concat_ws(" ", ordered).cast("binary")).as("chunk_fp"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t,
             |    generate_subscripts(regexp_split_to_array(lower(trim(text)), '\s+'), 1) - 1 AS pos
             |  FROM documents)
             |SELECT doc_id, CAST(floor(pos / 128) AS BIGINT) AS chunk_id,
             |  count(*) AS n_tokens,
             |  md5(string_agg(t, ' ' ORDER BY pos)) AS chunk_fp
             |FROM tok GROUP BY doc_id, chunk_id
             |ORDER BY doc_id, chunk_id""".stripMargin),
      "context-length chunking: 128-token windows with per-chunk content fingerprints"),

    // Gopher-style repetition gate: duplicated-token and duplicated-3-gram
    // fractions per document (boilerplate/spam signal). Doc-keyed
    // count-distinct aggs — co-partitions with the rest of the curation
    // pipeline's doc_id shuffles.
    "text_repetition" -> Q(
      (s, dir) => TextStats.repetitionStats(table(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t,
             |    generate_subscripts(regexp_split_to_array(lower(trim(text)), '\s+'), 1) AS pos
             |  FROM documents),
             |tstats AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT t) AS n_tok_d
             |           FROM tok GROUP BY doc_id),
             |sh AS (SELECT doc_id,
             |         t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS s
             |       FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
             |sstats AS (SELECT doc_id, count(*) AS n_3g, count(DISTINCT s) AS n_3g_d
             |           FROM sh WHERE s IS NOT NULL GROUP BY doc_id)
             |SELECT d.doc_id,
             |  round(coalesce(1.0 - CAST(t.n_tok_d AS DOUBLE) / t.n_tok, 0), 6) AS dup_token_frac,
             |  round(coalesce(1.0 - CAST(st.n_3g_d AS DOUBLE) / st.n_3g, 0), 6) AS dup_3gram_frac
             |FROM documents d
             |LEFT JOIN tstats t USING (doc_id)
             |LEFT JOIN sstats st USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin),
      "repetition scores: duplicated-token and duplicated-3-gram fractions"),

    // Eval-set hygiene: shared-7-gram contamination check of the "crawl"
    // (the planted duplicate docs) against a benchmark slice, benchmark
    // shingle set broadcast (eval sets are tiny next to a 100 TB corpus).
    "corpus_contamination" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
        val crawl = Dedup.planted(docs).filter(col("doc_id") >= 1000000L)
        Dedup.benchmarkContamination(crawl, bench).orderBy("doc_id")
      },
      Some(s"""WITH planted AS ($plantedSql),
              |bsh AS (SELECT DISTINCT s FROM (${ngramSql(
                "(SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0)", 7)}) q
              |        WHERE s IS NOT NULL),
              |crawl AS (SELECT doc_id, text FROM planted WHERE doc_id >= 1000000),
              |csh AS (SELECT DISTINCT doc_id, s FROM (${ngramSql("crawl", 7)}) q
              |        WHERE s IS NOT NULL),
              |ov AS (SELECT doc_id, count(*) AS n_overlap
              |       FROM csh JOIN bsh USING (s) GROUP BY doc_id)
              |SELECT c.doc_id,
              |  CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
              |  coalesce(o.n_overlap, 0) >= 5 AS contaminated
              |FROM crawl c LEFT JOIN ov o USING (doc_id)
              |ORDER BY c.doc_id""".stripMargin),
      "benchmark-contamination check: distinct shared 7-grams vs broadcast eval set"),

    // Deterministic mixture sampling: per-language acceptance rates via a
    // stable arithmetic hash threshold (never rand() — reruns and engines
    // must agree). doc_id is reduced mod p BEFORE the multiply so the
    // arithmetic stays under 2^63 for arbitrarily large ids (ANSI-safe at
    // 100 TB id ranges). Narrow filter — scan speed, no shuffle.
    // Deterministic negative sampling — the contrastive-training op that
    // pairs every positive (user bought item) with k pseudo-random items
    // the user did NOT buy. Candidates come from the house stable hash
    // (Knuth multiplicative, prime modulus — integer-exact cross-engine),
    // one probe per (user, i<k); probes that collide with a positive are
    // DROPPED, not retried (documented: survival ≈ 1 − purchase density,
    // deterministic, no iteration). Plan: |U|·k generated rows, one
    // broadcast 1-row item-count join, one shuffle_hash anti-join against
    // the positives — no per-user loop, no rejection sampling rounds.
    // The item-id domain is read from the part table (1..max contiguous
    // in the TPC-H layout), never a hardcoded constant.
    "sample_negatives" -> Q(
      (s, dir) => {
        val pos = table(s, dir, "orders")
          .select(col("o_custkey").as("u"), col("o_orderkey"))
          .join(table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey").as("item")),
            col("o_orderkey") === col("l_orderkey"))
          .select("u", "item").distinct()
        val users = table(s, dir, "orders").select(col("o_custkey").as("u")).distinct()
        val np = table(s, dir, "part").agg(max("p_partkey").as("np"))
        val P7 = 1000000007L
        val probes = users.crossJoin(broadcast(np))
          .withColumn("i", explode(array((0 until 4).map(lit): _*)))
          .withColumn("item",
            pmod(pmod(pmod(col("u") * 4 + col("i"), lit(P7)) * lit(2654435761L),
              lit(P7)), col("np")) + 1)
        probes.join(pos.hint("shuffle_hash"), Seq("u", "item"), "left_anti")
          .select(col("u").as("user_id"), col("i").as("probe_i"), col("item"))
          .orderBy("user_id", "probe_i")
      },
      Some("""WITH pos AS (
             |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS item
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |users AS (SELECT DISTINCT o_custkey AS u FROM orders),
             |pmax AS (SELECT max(p_partkey) AS np FROM part),
             |probes AS (
             |  SELECT u, i,
             |    ((((u*4 + i) % 1000000007) * 2654435761) % 1000000007) % np + 1 AS item
             |  FROM users CROSS JOIN pmax CROSS JOIN (VALUES (0),(1),(2),(3)) t(i))
             |SELECT p.u AS user_id, p.i AS probe_i, p.item
             |FROM probes p LEFT JOIN pos ON p.u = pos.u AND p.item = pos.item
             |WHERE pos.u IS NULL
             |ORDER BY user_id, probe_i""".stripMargin),
      "deterministic hash-probe negative sampling (k=4 non-purchased items per user)"),

    // Hashing-trick feature vectorization: whitespace tokens hashed into
    // 256 buckets (md5-prefix integer, cross-engine exact), per-doc
    // bucket counts summarized as (n_buckets, Σcount², max count) — the
    // fixed-dimension sparse featurizer (Weinberger et al.) that needs NO
    // vocabulary build, no fit step, no broadcast dictionary. Two keyed
    // aggregations, both map-side combinable; the token stream never
    // joins anything.
    "feature_hash" -> Q(
      (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("t"))
        toks
          .withColumn("b",
            pmod(conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"), lit(256)))
          .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("c") * col("c")).as("sum_sq"),
            max(col("c")).as("max_c"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
             |  FROM documents),
             |bk AS (
             |  SELECT doc_id, ('0x' || substr(md5(t), 1, 6))::BIGINT % 256 AS b,
             |    count(*) AS c
             |  FROM toks GROUP BY 1, 2)
             |SELECT doc_id, count(*) AS n_buckets,
             |  CAST(sum(c*c) AS BIGINT) AS sum_sq, max(c) AS max_c
             |FROM bk GROUP BY 1 ORDER BY doc_id""".stripMargin),
      "hashing-trick featurizer: 256 md5-bucketed token counts per doc, no vocabulary"),

    "corpus_mix_sample" -> Q(
      (s, dir) => {
        val rate = when(col("lang") === "en", lit(10000L))
          .when(col("lang").isin("zh", "es"), lit(5000L))
          .when(col("lang") === "de", lit(2500L))
          .otherwise(lit(1000L))
        val u = pmod(pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
          lit(1000000007L)), lit(10000L))
        table(s, dir, "documents")
          .filter(u < rate)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang FROM documents
             |WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007) % 10000 <
             |  CASE WHEN lang = 'en' THEN 10000
             |       WHEN lang IN ('zh', 'es') THEN 5000
             |       WHEN lang = 'de' THEN 2500 ELSE 1000 END
             |ORDER BY doc_id""".stripMargin),
      "deterministic per-language mixture sampling via stable hash threshold"),

    // Temperature-scaled source mixing — the multilingual-LM sampling rule
    // p_s ∝ (n_s/N)^(1/τ) with τ=2 (so the weight is sqrt(n_s)): small
    // sources are upsampled relative to their share, large ones capped.
    // Unlike corpus_mix_sample's FIXED rate table, the per-source rates
    // are DERIVED from corpus counts. The weights are held in fixed-point
    // integers (sqrt scaled to 1e6, then pure BIGINT arithmetic) so the
    // oracle is bit-identical — a double sum over sources would be
    // partition-order-dependent. Plan: one tiny source-count aggregate →
    // 1-row normalizer cross-broadcast → ~|sources|-row rate table
    // broadcast back onto the scan; the corpus is read ONCE with no
    // fact-side shuffle. Rate arithmetic runs in DECIMAL(38,0) (HUGEINT
    // in the oracle) — int64 would overflow at ~4M docs per source.
    "sample_temperature" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("s6",
            floor(sqrt(col("n").cast("double")) * lit(1000000.0)).cast("long"))
        val z = counts.agg(sum("s6").as("z6"), sum("n").as("ntot"))
        // DECIMAL(38,0) keeps the product exact far past BIGINT's range:
        // s6·(ntot/4)·10⁴ overflows int64 at only ~4M docs/source (2e19),
        // while 38 digits cover corpus sizes past 100 TB. IntegralDivide
        // on decimals is an exact integer quotient; DuckDB mirrors with
        // HUGEINT (int128) — both floor the same exact rational.
        // Under non-ANSI Spark a DECIMAL(38,0) overflow yields NULL, and
        // least() would silently absorb it into the 10000 clamp while the
        // oracle's HUGEINT twin errors — the engines would stop agreeing
        // exactly when the number is wrong. The coalesce→raise_error
        // makes Spark fail loudly too (the scale is far beyond any real
        // corpus: 38 digits cover ~1e28 docs/source).
        val rates = counts.crossJoin(broadcast(z))
          .withColumn("q", expr(
            """CAST((CAST(s6 AS DECIMAL(38,0)) * (ntot div 4) * 10000)
              |     div (CAST(z6 AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin))
          .withColumn("rate10k",
            least(lit(10000L), coalesce(col("q"), raise_error(concat(
              lit("sample_temperature: rate quotient overflowed DECIMAL(38,0) for source "),
              col("source"))))))
          .select(col("source"), col("rate10k"))
        val u = pmod(pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
          lit(1000000007L)), lit(10000L))
        docs.join(broadcast(rates), "source")
          .filter(u < col("rate10k"))
          .select(col("doc_id"), col("source"), col("rate10k"))
          .orderBy("doc_id")
      },
      Some("""WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
             |c6 AS (SELECT source, n,
             |         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS s6
             |       FROM counts),
             |z AS (SELECT sum(s6) AS z6, sum(n) AS ntot FROM c6),
             |rates AS (SELECT source,
             |            least(10000, CAST((CAST(s6 AS HUGEINT) * (ntot // 4) * 10000)
             |                              // (CAST(z6 AS HUGEINT) * n) AS BIGINT)) AS rate10k
             |          FROM c6 CROSS JOIN z)
             |SELECT d.doc_id, d.source, CAST(r.rate10k AS BIGINT) AS rate10k
             |FROM documents d JOIN rates r USING (source)
             |WHERE (((d.doc_id % 1000000007) * 2654435761) % 1000000007) % 10000 < r.rate10k
             |ORDER BY d.doc_id""".stripMargin),
      "temperature-scaled (τ=2) source mixing: fixed-point sqrt weights, hash-threshold sample")
  )
}
