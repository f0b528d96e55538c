package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact fixed-point logistic-regression training — the ONE definition
  * of the gradient-step arithmetic shared by the batch `quality_train` /
  * `quality_train_eval` queries (K epochs over a static corpus) and the
  * online [[sgdIngestBatch]] ingest path (one step per arriving batch).
  * All arithmetic is int64 micro-units: Elliott rational sigmoid
  * 0.5 + 0.5·z/(1+|z|) (libm exp() differs across engines in last ulps;
  * a rational σ in fixed point is bit-identical), order-independent
  * integer gradient sums, and every division reduced to an exact
  * multiple via pmod so trunc-div and floor-div agree on negatives.
  */
object Trainer {

  /** Floor-div with b>0 via the exact-multiple trick. */
  private[graft] def fd(a: String, b: String) =
    s"((($a) - pmod(($a), ($b))) div ($b))"

  /** ONE gradient step over a (y, x0, x1, x2) feature frame against a
    * broadcast 1-row (w0, w1, w2) weight frame: map-side-combinable
    * aggregate, lr = 0.1 as the /10 in the update. Returns the 1-row
    * (n, w0, w1, w2, sae6) post-step frame; empty input holds the
    * weights. The incoming weights ride OUTSIDE the row aggregate (a
    * crossJoin back after the gradient agg) — an earlier form carried
    * them through max(wj), which on an EMPTY batch aggregated to NULL
    * and coalesced to 0, silently resetting the weights (and, via
    * [[sgdIngestBatch]], writing a zero-weight ledger row that every
    * later batch trained from). */
  def step(feats: DataFrame, w: DataFrame): DataFrame =
    feats.crossJoin(broadcast(w))
      .withColumn("z6", expr("x0*w0 + x1*w1 + x2*w2"))
      .withColumn("r6", expr(
        s"500000 + ${fd("500000*z6", "1000000 + abs(z6)")} - y*1000000"))
      .agg(count(lit(1)).as("n"),
        sum(expr("x0*r6")).as("g0"), sum(expr("x1*r6")).as("g1"),
        sum(expr("x2*r6")).as("g2"), sum(abs(col("r6"))).as("sae6"))
      .crossJoin(broadcast(w))
      .select(col("n"),
        expr(s"w0 - ${fd("coalesce(g0, 0L)", "greatest(n, 1L)*10")}").as("w0"),
        expr(s"w1 - ${fd("coalesce(g1, 0L)", "greatest(n, 1L)*10")}").as("w1"),
        expr(s"w2 - ${fd("coalesce(g2, 0L)", "greatest(n, 1L)*10")}").as("w2"),
        coalesce(col("sae6"), lit(0L)).as("sae6"))

  /** K full-batch epochs from zero init: each epoch ONE [[step]], the
    * 1-row weights localCheckpointed so the lazy chain never re-runs
    * earlier epochs. Returns the K per-epoch frames (quality_train emits
    * the whole trajectory; its eval takes `.last`). */
  def epochs(s: SparkSession, feats: DataFrame, k: Int): Seq[DataFrame] = {
    var w = s.range(1)
      .select(lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"))
    (1 to k).map { _ =>
      val out = step(feats, w).localCheckpoint()
      w = out.select("w0", "w1", "w2")
      out
    }
  }

  /** Post-step batch output row (no batch_id column — the id is the
    * output partition directory; a physical twin column would collide
    * with partition discovery when consumers read the parent dir). */
  val OutSchema: StructType = StructType(Seq(
    StructField("n", LongType),
    StructField("w0", LongType), StructField("w1", LongType),
    StructField("w2", LongType), StructField("sae6", LongType)))

  /** Standing weights ledger: one row per applied batch. */
  val LedgerSchema: StructType =
    StructType(StructField("batch_id", LongType) +: OutSchema.fields)

  /** Latest weights as of a (replay-duplicate-tolerant) ledger frame:
    * full-row dedup, LOUD conflict guard (two rows disagreeing on one
    * batch_id can only come from misuse — readLedger's contract), then
    * the max-batch_id row; zeros before the first batch. */
  def latestWeights(ledger: DataFrame): DataFrame = {
    val rows = ledger.dropDuplicates()
    val conflicts = rows.groupBy("batch_id").count()
      .filter(col("count") > 1).count()
    require(conflicts == 0,
      s"sgd ledger: $conflicts batch_id(s) carry conflicting weights")
    rows.unionByName(rows.sparkSession.range(1)
        .select(lit(-1L).as("batch_id"), lit(0L).as("n"), lit(0L).as("w0"),
          lit(0L).as("w1"), lit(0L).as("w2"), lit(0L).as("sae6")))
      .orderBy(desc("batch_id")).limit(1)
      .select("w0", "w1", "w2")
  }

  /** One feature micro-batch through online SGD, exactly-once on the
    * [[IngestRecipe]] seam: anti-join the standing weights ledger on this
    * batch's own batch_id (a replay that crashed after the merge landed
    * steps from the exact pre-crash weights), apply ONE [[step]] from the
    * latest surviving weights, write the post-step row under
    * `batch_id=<id>` (overwrite — replay rewrites, never re-appends), and
    * append it to the ledger via the output read-back (the cap-ledger
    * shape: the merge IS a projection of the probe's own output).
    *
    * Semantics: one gradient step per arriving batch — online SGD, the
    * training loop a 100 TB ingest actually runs (re-running K epochs
    * over all history per batch would be O(corpus) per batch). Feeding
    * the SAME feature batch as batches 1..K reproduces
    * `quality_train`'s K epochs bit-for-bit (identical [[step]];
    * spec-pinned). Ledger size is one row per batch — monitoring-scale,
    * never data-scale; [[IngestRecipe.compact]] is the standing repair
    * for replay duplicates. */
  def sgdIngestBatch(feats: DataFrame, ledgerPath: String, outPath: String,
      batchId: Long): Unit = {
    val spark = feats.sparkSession
    val keys = spark.range(1).select(lit(batchId).as("batch_id"))
    IngestRecipe.applyBatchMergeFromOutput(
      keys, batchId, outPath, OutSchema,
      Seq(ledgerPath -> LedgerSchema)) {
      case Seq(base) =>
        // step from the weights AS OF batch_id-1, never "latest": a
        // sequential trainer's input state is defined by batch ORDER, so
        // a replay must recompute identical weights even if later
        // batches' rows already landed (caught by TrainerSpec: an
        // unfiltered latest made an out-of-order replay step from the
        // FUTURE and append a conflicting ledger row)
        step(feats, latestWeights(base.filter(col("batch_id") < batchId)))
    } { outBack =>
      Seq(IngestRecipe.IndexPart(ledgerPath, LedgerSchema,
        outBack.select(lit(batchId).as("batch_id"), col("n"), col("w0"),
          col("w1"), col("w2"), col("sae6"))))
    }
  }
}
