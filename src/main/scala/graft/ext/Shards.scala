package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + training-shard assignment — the last
  * step of a training-data pipeline: the curated corpus is shuffled ONCE
  * (so sequential shard reads are i.i.d. draws) and written as N shards a
  * data loader streams without further randomization.
  *
  * The shuffle key is content-independent, seed-salted md5 of the doc id
  * — never `rand()`: reruns, engines, and restarted jobs must all agree
  * on where every document lands (the same stable-key discipline as
  * `corpus_split`, which handles train/val/test; this handles WITHIN-split
  * ordering and sharding). Shard id comes from the first two hex digits
  * of the key (uniform over 0..255, folded mod `nShards`), mapped with
  * `instr` arithmetic that both Spark and DuckDB evaluate identically —
  * no hex→int cast, which the two engines don't share.
  *
  * Scale shape: assignment is a narrow map (one md5 + string math per
  * row); the audit is one groupBy on `nShards` keys with map-side partial
  * aggregation; the writer is one repartition-by-shard, the shuffle a
  * 100 TB corpus pays exactly once. Per-shard checksums are bounded-state
  * SUMs (a 16-bit fold of each doc's content hash), never a string_agg
  * of the shard — driver- and executor-memory stay O(nShards).
  */
object Shards {

  /** 1-based hex-digit position → 0..15 value, portable across engines.
    * Built with the Column API (`call_function`), not an `expr()` string
    * interpolation — the latter only resolved for a bare named column
    * and silently mis-parsed any derived/qualified input. */
  private[graft] def hexVal(h: Column, i: Int): Column =
    call_function("instr", lit("0123456789abcdef"), substring(h, i, 1)) - 1

  /** Integer value of the first `n` lowercase-hex digits of `h` — EXACTLY
    * Σ_{i=1..n} hexVal(h,i)·16^{n−i}, computed as one codegen'd
    * base-16 `conv` instead of n substring+instr+multiply chains (the
    * r16 optimization: the per-digit form dominated the per-row cost of
    * the md5-uniform operators — ×48 replicas per row in the bootstrap).
    * The DuckDB twins keep their per-digit instr arithmetic (no hex→int
    * cast exists there); only VALUES must agree, and both read the same
    * digits. */
  private[graft] def hexPrefixVal(h: Column, n: Int): Column =
    conv(substring(h, 1, n), 16, 10).cast("long")

  /** Shuffle key + shard assignment. Adds `h` (the global shuffle key),
    * `ht` (content hash, for the checksum) and `shard`. The shard id
    * folds the first FOUR hex digits (16 bits, uniform over 0..65535) mod
    * `nShards`, so balance skew from the mod bias is ≤ nShards/65536
    * (0.02% at 16 shards) and `nShards` up to the enforced 4096 bound
    * leaves no shard structurally empty. */
  def assignShards(docs: DataFrame, nShards: Int, seed: String = "#shard42"): DataFrame = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096] (16-bit key fold): $nShards")
    val withKeys = docs
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(seed))))
      .withColumn("ht", md5(col("text")))
    withKeys.withColumn("shard",
      (hexPrefixVal(col("h"), 4) % nShards).cast("int"))
  }

  /** Per-shard audit: sizes, token mass, key range, and an
    * order-independent 16-bit content-hash checksum — the record a
    * loader checks before trusting a shard set (balance: max/min doc
    * counts should be ~1 under the uniform key; drift: checksum changes
    * iff any document's content or membership changed). */
  def shardStats(docs: DataFrame, nShards: Int, seed: String = "#shard42"): DataFrame =
    assignShards(docs, nShards, seed)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.wsTokenCount(col("text")).cast("long")).as("total_tokens"),
        min("h").as("key_lo"),
        max("h").as("key_hi"),
        sum(hexVal(col("ht"), 1) * 4096 + hexVal(col("ht"), 2) * 256 +
          hexVal(col("ht"), 3) * 16 + hexVal(col("ht"), 4)).as("checksum16"))
      .orderBy("shard")

  /** DuckDB twin of [[shardStats]] — same md5 keys, same instr hex
    * arithmetic, same fold. */
  def shardStatsSql(nShards: Int, seed: String = "#shard42"): String =
    s"""WITH k AS (
       |  SELECT doc_id, text,
       |    md5(CAST(doc_id AS VARCHAR) || '$seed') AS h,
       |    md5(text) AS ht
       |  FROM documents),
       |s AS (
       |  SELECT *,
       |    CAST(((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096
       |         + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256
       |         + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16
       |         + (instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % $nShards AS INTEGER) AS shard
       |  FROM k)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       |  min(h) AS key_lo, max(h) AS key_hi,
       |  CAST(sum((instr('0123456789abcdef', substring(ht, 1, 1)) - 1) * 4096
       |         + (instr('0123456789abcdef', substring(ht, 2, 1)) - 1) * 256
       |         + (instr('0123456789abcdef', substring(ht, 3, 1)) - 1) * 16
       |         + (instr('0123456789abcdef', substring(ht, 4, 1)) - 1)) AS BIGINT) AS checksum16
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  /** Token-balance audit of two shard layouts: the HASH baseline
    * ([[assignShards]] — random placement, balanced in expectation only)
    * against the token-BALANCED sorted round-robin (docs ranked by token
    * count descending, shard = rank mod n — the classic LPT-flavored
    * greedy that bounds max-shard overshoot even under long-tailed doc
    * lengths, which is what sequence-packing efficiency downstream
    * cares about). Per (method, shard): doc count, token mass, and the
    * exact ppm share of total tokens. The global ordinal comes from
    * [[Indexing.globalIndex]] (range shuffle + zipWithIndex), NEVER an
    * unpartitioned window — ranking is the 100 TB hazard here, and the
    * sort key is one lexicographic string (zero-padded token complement
    * ‖ zero-padded doc_id; bounds: tokens < 10⁷, doc_id < 10¹⁸ — far
    * above any real corpus, same documented-pad contract as winnowing's
    * position complement). The per-method total join broadcasts a 2-row
    * aggregate. */
  def balanceAudit(docs: DataFrame, nShards: Int,
      seed: String = "#shard42"): DataFrame = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096]: $nShards")
    val withTok = docs.select(col("doc_id"), col("text"))
      .withColumn("tok", TextStats.wsTokenCount(col("text")).cast("long"))
    // loud pad-contract guard ([[Guards.padGuard]]): a doc at ≥10⁷ tokens
    // would make the complement negative and the zero-padded sort key
    // lexicographically wrong — fail the job instead of silently
    // mis-ranking the balanced leg
    val guard = Guards.padGuard(col("tok"), 9999999L, "balanceAudit: token count")
    val keyed = withTok.withColumn("k",
      concat(lpad((lit(9999999L) - col("tok") + guard).cast("string"), 7, "0"),
        lpad(col("doc_id").cast("string"), 18, "0")))
    val balanced = Indexing.globalIndex(keyed, "k")
      .withColumn("shard", (col("global_idx") % nShards).cast("int"))
      .withColumn("method", lit("balanced"))
    val hashed = assignShards(withTok, nShards, seed)
      .withColumn("method", lit("hash"))
    val perShard = Seq(balanced, hashed)
      .map(_.groupBy("method", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("tok_mass")))
      .reduce(_ unionByName _)
    val totals = perShard.groupBy("method").agg(sum("tok_mass").as("tot"))
    perShard.join(broadcast(totals), "method")
      .select(col("method"), col("shard"), col("n_docs"), col("tok_mass"),
        expr("(tok_mass * 1000000) div tot").as("share_ppm"))
      .orderBy("method", "shard")
  }

  /** DuckDB twin of [[balanceAudit]] — the oracle side may use the
    * global window (no plan constraints there); same total order, same
    * md5 fold, same fixed-point share. */
  def balanceAuditSql(nShards: Int, seed: String = "#shard42"): String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |bal AS (
       |  SELECT 'balanced' AS method,
       |    CAST((row_number() OVER (ORDER BY tok DESC, doc_id) - 1) % $nShards AS INTEGER) AS shard,
       |    tok
       |  FROM d),
       |hs AS (
       |  SELECT 'hash' AS method,
       |    CAST(((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '$seed'), 1, 1)) - 1) * 4096
       |         + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '$seed'), 2, 1)) - 1) * 256
       |         + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '$seed'), 3, 1)) - 1) * 16
       |         + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '$seed'), 4, 1)) - 1)) % $nShards AS INTEGER) AS shard,
       |    tok
       |  FROM d),
       |u AS (
       |  SELECT method, shard, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(tok) AS BIGINT) AS tok_mass
       |  FROM (SELECT * FROM bal UNION ALL SELECT * FROM hs)
       |  GROUP BY 1, 2),
       |t AS (SELECT method, sum(tok_mass) AS tot FROM u GROUP BY 1)
       |SELECT method, shard, n_docs, tok_mass,
       |  CAST((tok_mass * 1000000) // tot AS BIGINT) AS share_ppm
       |FROM u JOIN t USING (method) ORDER BY method, shard""".stripMargin

  /** Materialize the shard layout: repartition ON the shard id (the one
    * full shuffle), order within each partition by the shuffle key (so a
    * shard file streams in its final, shuffled-once order), write
    * shard-partitioned parquet. Deterministic end to end — two writes of
    * the same corpus produce identical shard contents in identical order. */
  def writeShards(docs: DataFrame, nShards: Int, path: String,
      seed: String = "#shard42"): Unit =
    assignShards(docs, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "h")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
