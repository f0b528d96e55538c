package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental per-source corpus audit — the streaming twin of the
  * `corpus_source_audit` query, maintained at ingest.
  *
  * Layout is the bronze→silver split a warehouse ingest runs: each
  * micro-batch writes its documents as NARROW fact rows (source, lang,
  * token/char counts, content fingerprint — never the text itself) into a
  * `batch_id=<id>` directory, and the audit is an aggregation view over
  * the fact table. Per-batch work is O(delta) and the write is an
  * OVERWRITE of the batch's own directory, so an at-least-once replay of
  * a batch (crash between write and checkpoint commit) rewrites the same
  * rows instead of double-counting — idempotence by partition overwrite,
  * the standard foreachBatch exactly-once recipe.
  *
  * The additive metrics (docs, tokens, chars) could be pre-aggregated per
  * batch, but the distinct metrics (languages, exact-duplicate
  * fingerprints) cannot be merged from per-batch partials without the
  * row-level fingerprints anyway — a fingerprint seen in batch 1 and
  * batch 7 must count once. Keeping the narrow facts makes the snapshot
  * exact at any point; at 100 TB the facts stay a tiny fixed-width
  * fraction of the corpus and the snapshot is one scan-speed groupBy on
  * the source key (20 groups here). */
object SourceAudit {

  /** Columns must stay in lock-step with the `corpus_source_audit`
    * oracle: same token regex, same fingerprint function. */
  private def facts(batch: DataFrame): DataFrame =
    batch.select(
      col("source"), col("lang"), col("n_chars"),
      TextStats.wsTokenCount(col("text")).cast("long").as("toks"),
      md5(col("text")).as("fp"))

  /** Ingest one micro-batch: write its narrow fact rows under the batch's
    * own directory ([[IngestRecipe.writeBatchOutput]] — overwrite →
    * replay-idempotent). No standing-index probe here: the fact table IS
    * the state, and it is exactly-once by the partition overwrite alone. */
  def auditIngestBatch(batch: DataFrame, statePath: String, batchId: Long): Unit =
    IngestRecipe.writeBatchOutput(facts(batch), s"$statePath/facts", batchId)

  /** The audit table over everything ingested so far — identical schema
    * and values to the batch `corpus_source_audit` over the same rows.
    * Before the first batch lands (no facts yet) the audit is simply
    * empty, not an error — same cold-start contract as the dedup-ingest
    * index. */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    import org.apache.spark.sql.types._
    val factsSchema = StructType(Seq(
      StructField("source", StringType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("toks", LongType),
      StructField("fp", StringType)))
    ParquetIO.readOrEmpty(spark, s"$statePath/facts", factsSchema)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dup"))
      .withColumn("dup_rate",
        round(col("n_exact_dup").cast("double") / col("n_docs").cast("double"), 4))
      .orderBy("source")
  }
}
