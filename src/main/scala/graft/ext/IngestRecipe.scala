package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ONE exactly-once recipe every standing-index ingest path follows
  * ([[Dedup.dedupIngestBatch]], [[Dedup.boilerplateIngestBatch]],
  * [[Dedup.semanticIngestBatch]], [[Dedup.cascadeIngestBatch]],
  * [[SourceAudit.auditIngestBatch]]).
  * foreachBatch is at-least-once; per-batch OUTPUT becomes exactly-once
  * by partition overwrite, and the PROBE becomes replay-deterministic by
  * anti-joining the standing index against the batch's own keys:
  *
  *   1. read each standing index component (missing path = well-defined
  *      cold start, [[ParquetIO.readOrEmpty]]) and anti-join away the
  *      batch's own keys — a replay that crashed AFTER the index merge
  *      landed probes the exact pre-crash base;
  *   2. run the probe over those bases; write its result under the
  *      batch's own `batch_id=<id>` directory with mode OVERWRITE, so a
  *      replayed batch rewrites the same files instead of re-appending;
  *   3. append the batch's rows to each index component (O(delta) files;
  *      partitioned components land only in their bucket footprint).
  *
  * Step 3 stays append, so a replay can leave DUPLICATE rows in a
  * standing index — every consumer must be duplicate-tolerant
  * (countDistinct / rank-collapse, pinned by the doubled-index
  * equivalence specs), and [[compact]] is the periodic repair that
  * resets index size and probe cost. Centralizing the armor here exists
  * because it is easy to get subtly wrong per-path (a replay-duplicate-
  * unsafe consumer shipped once and was caught only in self-review).
  */
object IngestRecipe {

  /** One standing-index component: where it lives, its read schema, the
    * batch's rows to merge in, and (for bucket-partitioned layouts) the
    * partition columns the append must respect. */
  final case class IndexPart(
      path: String,
      schema: StructType,
      rows: DataFrame,
      partitionBy: Seq[String] = Nil)

  /** Exactly-once per-batch output: `batch_id=<id>` partition overwrite. */
  def writeBatchOutput(df: DataFrame, outPath: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  /** Run one micro-batch through the full recipe. `batchKeys` carries the
    * batch's key column (its column NAMES are the anti-join keys — e.g. a
    * one-column `doc_id` or `vec_id` frame); `probe` receives one
    * pre-crash base per [[IndexPart]], in order, and its result is the
    * batch's exactly-once output. */
  def applyBatch(batchKeys: DataFrame, batchId: Long, outPath: String,
      parts: Seq[IndexPart])(probe: Seq[DataFrame] => DataFrame): Unit = {
    val bases = preCrashBases(batchKeys, parts.map(p => p.path -> p.schema))
    writeBatchOutput(probe(bases), outPath, batchId)
    appendParts(parts)
  }

  /** Step 1, shared: each standing component anti-joined against the
    * batch's own keys — the pre-crash base a replay must probe. */
  private def preCrashBases(batchKeys: DataFrame,
      parts: Seq[(String, StructType)]): Seq[DataFrame] =
    preCrashBasesKeyed(parts.map { case (p, s) => (p, s, batchKeys) })

  /** [[applyBatch]] with PER-PART key frames, for recipes whose standing
    * components key on different columns (the BM25 index: postings /
    * doclens / positions anti-join on doc_id, the corpus-stats ledger on
    * batch_id). Same three steps, same replay armor. */
  def applyBatchKeyed(batchId: Long, outPath: String,
      parts: Seq[(IndexPart, DataFrame)])
      (probe: Seq[DataFrame] => DataFrame): Unit = {
    val bases = preCrashBasesKeyed(
      parts.map { case (p, keys) => (p.path, p.schema, keys) })
    writeBatchOutput(probe(bases), outPath, batchId)
    appendParts(parts.map(_._1))
  }

  /** Per-part key frames, for recipes whose components key on different
    * columns (the cascade's exact/LSH parts key on doc_id, its semantic
    * part on vec_id): each component anti-joins ITS OWN key frame's
    * column names. */
  private def preCrashBasesKeyed(
      parts: Seq[(String, StructType, DataFrame)]): Seq[DataFrame] =
    parts.map { case (path, schema, keys) =>
      ParquetIO.readOrEmpty(keys.sparkSession, path, schema)
        .join(keys, keys.columns.toSeq, "left_anti")
    }

  /** Step 3, shared: O(delta) append of the batch's rows to each index
    * component (partitioned components land only in their footprint). */
  private def appendParts(parts: Seq[IndexPart]): Unit =
    parts.foreach { p =>
      val w = p.rows.write.mode("append")
      (if (p.partitionBy.nonEmpty) w.partitionBy(p.partitionBy: _*) else w)
        .parquet(p.path)
    }

  /** [[applyBatch]] variant for paths whose index merge is a PROJECTION
    * OF THE PROBE'S OWN OUTPUT (e.g. the contribution-cap ledger gains
    * exactly the kept rows the probe selected): same steps 1–2, then the
    * just-written `batch_id=<id>` partition is read back (schema-pinned)
    * and `merge` maps it to the index components to append. The read-back
    * exists only after step 2, so the merge frame can't be built by the
    * caller up front (Spark analyzes reads eagerly), and appending a
    * plan that re-reads the index path itself would self-read-while-
    * writing — this variant is the safe shape for output-derived merges.
    * Replay behavior is unchanged: output overwrite is idempotent, the
    * re-appended merge rows are identical duplicates consumers must
    * distinct-collapse. */
  def applyBatchMergeFromOutput(batchKeys: DataFrame, batchId: Long,
      outPath: String, outSchema: StructType,
      probeParts: Seq[(String, StructType)])
      (probe: Seq[DataFrame] => DataFrame)
      (merge: DataFrame => Seq[IndexPart]): Unit =
    applyBatchMergeFromOutputKeyed(batchId, outPath, outSchema,
      probeParts.map { case (p, s) => (p, s, batchKeys) })(probe)(merge)

  /** [[applyBatchMergeFromOutput]] with PER-PART key frames, for recipes
    * whose standing components key on different columns (the dedup
    * cascade: exact + LSH components anti-join on doc_id, the semantic
    * assignment component on vec_id). Same steps, same replay armor. */
  def applyBatchMergeFromOutputKeyed(batchId: Long,
      outPath: String, outSchema: StructType,
      probeParts: Seq[(String, StructType, DataFrame)])
      (probe: Seq[DataFrame] => DataFrame)
      (merge: DataFrame => Seq[IndexPart]): Unit = {
    val bases = preCrashBasesKeyed(probeParts)
    writeBatchOutput(probe(bases), outPath, batchId)
    val outBack = probeParts.head._3.sparkSession.read.schema(outSchema)
      .parquet(s"$outPath/batch_id=$batchId")
    appendParts(merge(outBack))
  }

  /** Periodic compaction of a replay-duplicated standing index: full-row
    * dropDuplicates, rewrite, atomic-ish swap. Consumers stay CORRECT
    * without it (duplicate tolerance is their contract); compaction
    * resets the monotonic size/probe-cost growth an at-least-once replay
    * history leaves behind. Local/HDFS rename swaps the directory; an
    * object-store deployment would write a new snapshot path and flip a
    * manifest pointer instead — same two-phase shape. */
  def compact(spark: SparkSession, path: String, schema: StructType,
      partitionBy: Seq[String] = Nil): Unit = {
    val tmp = path.stripSuffix("/") + "__compact"
    val w = ParquetIO.readOrEmpty(spark, path, schema)
      .dropDuplicates()
      .write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp)
    val conf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(tmp)
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
  }
}
