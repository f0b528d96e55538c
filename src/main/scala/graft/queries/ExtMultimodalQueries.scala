package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Indexing, Mining, Multimodal, Sessionize, Similarity, TextStats, Upsert}
import graft.queries.ExtQueries._
import graft.queries.Registry.{events, table}

/** Multimodal operators split out of [[ExtQueries]]: opaque-binary
  * metadata, feature extraction, frame sampling, pHash screens and the
  * standing pHash index, fuzzy record linkage. */
object ExtMultimodalQueries {

  val all: Map[String, Q] = Map(
    // --------------------------------------------------------- multimodal
    // The batched decode (mapPartitions, one codec init per task) runs the
    // deterministic stub; its checksum is persisted (OracleAux) and every
    // DERIVED column — media_type, n_bytes, width, height — is recomputed
    // independently by DuckDB from documents + the persisted checksum, so
    // the whole decode →features plumbing is hash-gated, stub and all.
    "multimodal_features" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.mediaTable(table(s, dir, "documents"))
          .as[Multimodal.MediaRow]
        val feats = Multimodal.extractFeatures(media).toDF()
        OracleAux.persist(dir, "multimodal_features")(feats)
          .select("doc_id", "media_type", "n_bytes", "width", "height", "checksum")
          .orderBy("doc_id")
      },
      Some(s"""WITH feats AS (
              |  SELECT doc_id, checksum
              |  FROM read_parquet(${OracleAux.duckGlob("multimodal_features")}))
              |SELECT d.doc_id,
              |  CASE (d.doc_id % 3 + 1) WHEN 1 THEN 'image/png' WHEN 2 THEN 'audio/wav'
              |       ELSE 'video/mp4' END AS media_type,
              |  CAST(octet_length(encode(d.text)) AS INTEGER) AS n_bytes,
              |  CAST(64 + abs(f.checksum % 1024) AS INTEGER) AS width,
              |  CAST(64 + abs((f.checksum >> 10) % 1024) AS INTEGER) AS height,
              |  f.checksum
              |FROM documents d JOIN feats f ON f.doc_id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin),
      "batched media decode → feature columns (stub checksum persisted, derivations verified)"),

    // Video frame sampling: the sampling PLAN (which frame indices, their
    // timestamps) is arithmetic DuckDB re-derives independently from the
    // documents table — a LEFT join from the expected frame set, so a
    // missing or extra emitted frame breaks the row count, and a wrong
    // timestamp nulls out. The per-frame stub checksum is persisted and
    // passed through, exactly like multimodal_features' decode stub.
    "multimodal_framesample" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.mediaTable(table(s, dir, "documents"))
          .as[Multimodal.MediaRow]
        val frames = Multimodal.sampleFrames(media).toDF()
        OracleAux.persist(dir, "multimodal_framesample")(frames)
          .orderBy("doc_id", "frame_idx")
      },
      Some(s"""WITH fr AS (
              |  SELECT * FROM read_parquet(${OracleAux.duckGlob("multimodal_framesample")})),
              |vids AS (
              |  SELECT doc_id, greatest(octet_length(encode(text)) // 64, 1) AS nf
              |  FROM documents WHERE doc_id % 3 = 2),
              |exp AS (
              |  SELECT doc_id,
              |    CAST(unnest(range(0, nf, (nf + 7) // 8)) AS INTEGER) AS frame_idx
              |  FROM vids)
              |SELECT e.doc_id, e.frame_idx,
              |  CASE WHEN f.frame_ms = e.frame_idx * 40 THEN f.frame_ms END AS frame_ms,
              |  f.frame_checksum
              |FROM exp e LEFT JOIN fr f USING (doc_id, frame_idx)
              |ORDER BY e.doc_id, e.frame_idx""".stripMargin),
      "bounded-stride video frame sampling (sampling plan oracle-derived, stub decode persisted)"),

    "multimodal_meta" -> Q(
      (s, dir) => Multimodal.metadata(table(s, dir, "documents")),
      Some("""SELECT doc_id,
             |  CASE (doc_id % 3 + 1) WHEN 1 THEN 'image/png' WHEN 2 THEN 'audio/wav'
             |       ELSE 'video/mp4' END AS media_type,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin),
      "multimodal metadata view over binary payload columns"),

    // Exact binary-payload dedup over the media table: md5 the OPAQUE
    // payload bytes (no decode needed) and keep the duplicate groups —
    // the first pass of any multimodal ingest. The re-crawl is simulated
    // like the other planted-dup inputs (every 10th payload re-ingested
    // under a fresh id); the operator must surface exactly those groups.
    // Re-crawl ids offset past max(doc_id) + 1 (broadcast 1-row stats
    // join, never a fixed constant) so a real doc can never collide with
    // a simulated re-crawl on corpora of any size — keep_id = min is
    // then always the genuine original. One groupBy on a 128-bit key;
    // the payload bytes never shuffle (only the digest does).
    "multimodal_dedup" -> Q(
      (s, dir) =>
        Multimodal.mediaTable(withRecrawl(table(s, dir, "documents")))
          .groupBy(md5(col("payload")).as("payload_md5"))
          .agg(count(lit(1)).as("n"),
            min("doc_id").as("keep_id"), max("doc_id").as("max_dup_id"))
          .filter(col("n") > 1)
          .orderBy("payload_md5"),
      Some("""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
             |corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + mx + 1, text FROM documents, mx WHERE doc_id % 10 = 0)
             |SELECT md5(text) AS payload_md5, count(*) AS n,
             |  min(doc_id) AS keep_id, max(doc_id) AS max_dup_id
             |FROM corpus GROUP BY md5(text) HAVING count(*) > 1
             |ORDER BY payload_md5""".stripMargin),
      "binary-payload exact dedup: md5 the opaque media bytes, keep duplicate groups"),

    // Perceptual-hash NEAR-dup over media payloads — what multimodal_dedup's
    // md5 cannot catch: a re-crawl that re-encoded the asset (here: a
    // same-length one-byte perturbation) hashes to different bytes but
    // lands within Hamming ≤ 3 of the original's pHash. The decode→DCT
    // step is the deterministic stub (Multimodal.phashTable — interleaved
    // byte-sum parities, which preserve the k-bytes-changed ⇒ ≤ k-bits-
    // flipped locality a real pHash has); everything downstream is the
    // REAL scale machinery, shared verbatim with the SimHash screen
    // (Dedup.bandedHammingPairs: 4×16-bit pigeonhole bands, lossless for
    // Hamming ≤ 3). Oracle strength: DuckDB re-derives the ENTIRE band
    // join + popcount verify from the persisted per-doc hash table, so a
    // banding bug (not just a scoring bug) breaks the hash compare.
    "multimodal_phash" -> Q(
      (s, dir) => Dedup.bandedHammingPairs(
        OracleAux.persist(dir, "multimodal_phash_hashes")(phashHashes(s, dir)),
        "phash"),
      Some(phashBandSql("multimodal_phash_hashes")),
      "pHash near-dup over media payloads: stub decode, real banding — oracle re-derives the band join itself"),

    // The SAME screen served from the standing per-doc hash index — the
    // production split: payload decode + hashing (the dominant cost; a
    // real pHash pays a codec + DCT per asset) runs once per corpus
    // snapshot via Multimodal.phashIngestBatch's exactly-once maintenance,
    // and every re-crawl screen reads 16 bytes/doc instead of re-decoding
    // payloads. Output-identical to multimodal_phash by construction; the
    // oracle re-derives the full band join from the index it read.
    "multimodal_phash_indexed" -> Q(
      (s, dir) => {
        val hashes = s.read.schema(Multimodal.PhashSchema)
          .parquet(s"${phashIndexPath(s, dir)}/hashes")
        Dedup.bandedHammingPairs(
          OracleAux.persist(dir, "multimodal_phash_idx_hashes")(hashes),
          "phash")
      },
      Some(phashBandSql("multimodal_phash_idx_hashes")),
      "pHash near-dup served from the standing hash index (no payload re-decode)"),

    // Source-mix diversity per language (+ a '*' overall row) — the
    // metric tracked alongside corpus_mix_plan so a refresh can't quietly
    // collapse a language onto one crawl: Simpson concentration
    // λ = Σ(nᵢ/N)² and effective source count 1/λ in EXACT fixed point
    // (⌊Σnᵢ²·10⁶/N²⌋ over DECIMAL(38,0)/HUGEINT — no float enters the
    // index), plus Shannon entropy H = ln N − (Σ nᵢ·ln nᵢ)/N where the
    // float term-sum folds in source order on both engines (the
    // text_lm_score discipline: array_sort+aggregate ↔ list(ORDER BY)+
    // list_sum) so the double is bit-identical before rounding. Plan: ONE
    // (lang, source) count over the scan is the only data-sized shuffle;
    // everything after runs on a ≤ |langs|·|sources| frame.
    "corpus_diversity" -> Q(
      (s, dir) => {
        val base = table(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        def leg(grouped: org.apache.spark.sql.RelationalGroupedDataset) = grouped
          .agg(count(lit(1)).as("k_sources"), sum("n").as("n_docs"),
            sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("sumsq"),
            aggregate(
              transform(array_sort(collect_list(struct(col("source"), col("n")))),
                e => e.getField("n").cast("double") *
                  log(e.getField("n").cast("double"))),
              lit(0.0), (a, x) => a + x).as("tsum"))
        val perLang = leg(base.groupBy("lang"))
        val overall = leg(base.groupBy("source").agg(sum("n").as("n"))
          .withColumn("lang", lit("*")).groupBy("lang"))
        perLang.unionByName(overall)
          .select(col("lang"), col("k_sources"), col("n_docs").cast("long").as("n_docs"),
            expr("(sumsq * 1000000) div (CAST(n_docs AS DECIMAL(38,0)) * n_docs)")
              .cast("long").as("simpson6"),
            expr("(CAST(n_docs AS DECIMAL(38,0)) * n_docs * 1000000) div sumsq")
              .cast("long").as("eff6"),
            round(log(col("n_docs").cast("double")) - col("tsum") / col("n_docs"), 6)
              .as("shannon"))
          .orderBy("lang")
      },
      Some("""WITH base AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |leg AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS k_sources,
             |    CAST(sum(n) AS BIGINT) AS n_docs,
             |    sum(CAST(n AS HUGEINT) * n) AS sumsq,
             |    list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
             |                  ORDER BY source)) AS tsum
             |  FROM base GROUP BY lang),
             |base2 AS (SELECT source, CAST(sum(n) AS BIGINT) AS n
             |          FROM base GROUP BY source),
             |leg2 AS (
             |  SELECT '*' AS lang, CAST(count(*) AS BIGINT) AS k_sources,
             |    CAST(sum(n) AS BIGINT) AS n_docs,
             |    sum(CAST(n AS HUGEINT) * n) AS sumsq,
             |    list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
             |                  ORDER BY source)) AS tsum
             |  FROM base2),
             |u AS (SELECT * FROM leg UNION ALL SELECT * FROM leg2)
             |SELECT lang, k_sources, n_docs,
             |  CAST((sumsq * 1000000) // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS simpson6,
             |  CAST((CAST(n_docs AS HUGEINT) * n_docs * 1000000) // sumsq AS BIGINT) AS eff6,
             |  round(ln(CAST(n_docs AS DOUBLE)) - tsum / n_docs, 6) AS shannon
             |FROM u ORDER BY lang""".stripMargin),
      "source-mix diversity per lang: exact fixed-point Simpson/effective-sources, order-folded Shannon"),

    // Source-volume concentration — the Pareto view beside
    // corpus_diversity's entropy: the Gini coefficient of per-source
    // character volume (rank-weighted closed form 2·Σi·xᵢ/(n·Σx) −
    // (n+1)/n over the ascending-sorted volumes) plus top-1/top-3 volume
    // shares — the "is one crawl dominating the mix" check a mixture
    // planner reads before corpus_mix_plan rebalances. Rank sums S and
    // totals T stay exact BIGINT (i·xᵢ ≤ sources·chars, far inside
    // int64), so the final doubles are bit-identical cross-engine. Plan:
    // one combinable source groupBy; ranking runs as an array fold over
    // the source-cardinality list (tiny, metadata-scale — NEVER an
    // unpartitioned window), ties broken (vol, source) with the
    // descending fold mirrored exactly in the oracle.
    "corpus_concentration" -> Q(
      (s, dir) => {
        val sorted = array_sort(collect_list(struct(col("vol"), col("source"))))
        table(s, dir, "documents")
          .groupBy("source").agg(sum("n_chars").as("vol"))
          .agg(sorted.as("a"))
          .select(
            size(col("a")).cast("long").as("n"),
            aggregate(col("a"), lit(0L),
              (acc, x) => acc + x.getField("vol")).as("t"),
            aggregate(transform(col("a"), (x, i) =>
                (i + 1).cast("long") * x.getField("vol")),
              lit(0L), (acc, x) => acc + x).as("s"),
            element_at(col("a"), -1).getField("vol").as("t1"),
            aggregate(transform(slice(reverse(col("a")), 1, 3),
                x => x.getField("vol")),
              lit(0L), (acc, x) => acc + x).as("t3"))
          .select(col("n").as("n_sources"), col("t").as("total_chars"),
            round(lit(2.0) * col("s") / (col("n") * col("t").cast("double"))
              - (col("n") + lit(1)) / col("n").cast("double"), 4).as("gini"),
            round(col("t1") / col("t").cast("double"), 4).as("top1_share"),
            round(col("t3") / col("t").cast("double"), 4).as("top3_share"))
      },
      Some("""WITH v AS (
             |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS vol
             |  FROM documents GROUP BY 1),
             |r AS (SELECT vol, row_number() OVER (ORDER BY vol, source) AS i FROM v),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(vol) AS BIGINT) AS t,
             |        CAST(sum(i * vol) AS BIGINT) AS s FROM r),
             |tops AS (SELECT
             |    CAST(sum(vol) FILTER (WHERE rk <= 1) AS BIGINT) AS t1,
             |    CAST(sum(vol) FILTER (WHERE rk <= 3) AS BIGINT) AS t3
             |  FROM (SELECT vol,
             |          row_number() OVER (ORDER BY vol DESC, source DESC) AS rk
             |        FROM v))
             |SELECT n AS n_sources, t AS total_chars,
             |  round(2.0 * s / (n * CAST(t AS DOUBLE))
             |    - (n + 1) / CAST(n AS DOUBLE), 4) AS gini,
             |  round(t1 / CAST(t AS DOUBLE), 4) AS top1_share,
             |  round(t3 / CAST(t AS DOUBLE), 4) AS top3_share
             |FROM agg, tops""".stripMargin),
      "source-volume concentration: exact rank-sum Gini + top-1/top-3 shares"),

    // Per-language corpus health report — the one-page rollup a curation
    // pipeline publishes with every snapshot: volume, size profile, and
    // exact-dup rate from the content fingerprint. One grouped aggregate;
    // the dup rate is a ratio of exact integer counts, so the double is
    // bit-identical cross-engine before rounding.
    "corpus_report" -> Q(
      (s, dir) => table(s, dir, "documents")
        .select(col("lang"), length(col("text")).as("len"),
          graft.ext.TextStats.wsTokenCount(col("text")).as("tok"),
          graft.ext.TextStats.fingerprint(col("text")).as("fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("len"), 2).as("avg_chars"),
          round(avg("tok"), 2).as("avg_ws_tokens"),
          countDistinct(col("fp")).as("n_distinct"),
          round(lit(1.0) - countDistinct(col("fp")).cast("double") / count(lit(1)), 6)
            .as("dup_rate"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  round(avg(length(text)), 2) AS avg_chars,
             |  round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 2) AS avg_ws_tokens,
             |  count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS n_distinct,
             |  round(1.0 - CAST(count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS DOUBLE) / count(*), 6) AS dup_rate
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "per-language corpus health report: volume, size profile, exact-dup rate"),

    // Typo-tolerant linkage pairs over the corpus; DuckDB computes the
    // identical blocked edit-distance join. The registered form is the
    // SALT-CAPPED one (Dedup.fuzzyPairsCapped): output is bit-identical
    // to the plain blocked join the oracle runs, but oversized blocks
    // fan their quadratic pair work across an s×s salt grid instead of
    // one reducer — the skew shape that dominates blocked linkage at
    // scale. maxBlock=64 is deliberately small so the salting path is
    // exercised (not dead code) at harness scale.
    "link_fuzzy" -> Q(
      (s, dir) => Dedup.fuzzyPairsCapped(table(s, dir, "documents"))
        .orderBy("id_a", "id_b"),
      Some("""WITH k AS (
             |  SELECT doc_id, lang,
             |    substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 32) AS key,
             |    substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 8) AS blk
             |  FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.key, b.key) AS INTEGER) AS lev
             |FROM k a JOIN k b
             |  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
             |WHERE levenshtein(a.key, b.key) <= 5
             |ORDER BY id_a, id_b""".stripMargin),
      "blocked fuzzy record linkage: edit distance on normalized key prefixes")
  )
}
