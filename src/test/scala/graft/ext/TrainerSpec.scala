package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Trainer.sgdIngestBatch]] — online SGD on the IngestRecipe seam:
  * batch fold ≡ scalar sequential steps, the batch-K-times ≡ K-epoch
  * equivalence with the registered `quality_train`, crash-replay
  * idempotence, and the loud ledger-conflict guard. */
class TrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar ground truth of one exact fixed-point step. */
  private def scalarStep(rows: Seq[(Long, Long, Long, Long)],
      w: Vector[Long]): Vector[Long] = {
    def fd(a: Long, b: Long): Long = { val m = ((a % b) + b) % b; (a - m) / b }
    val r6s = rows.map { case (y, x0, x1, x2) =>
      val z = x0 * w(0) + x1 * w(1) + x2 * w(2)
      (Seq(x0, x1, x2), 500000L + fd(500000L * z, 1000000L + math.abs(z)) - y * 1000000L)
    }
    val n = math.max(rows.size.toLong, 1L)
    Vector.tabulate(3)(j =>
      w(j) - fd(r6s.map { case (x, r) => x(j) * r }.sum, n * 10))
  }

  private def df(rows: Seq[(Long, Long, Long, Long)]): DataFrame =
    rows.toDF("y", "x0", "x1", "x2")

  private val b = Seq(
    Seq((1L, 1L, 5L, 12L), (0L, 1L, 0L, 1L), (1L, 1L, 4L, 9L)),
    Seq((0L, 1L, 1L, 2L), (1L, 1L, 6L, 15L)),
    Seq((1L, 1L, 3L, 8L), (0L, 1L, 0L, 0L), (0L, 1L, 2L, 3L)))

  private def ledgerRows(path: String) =
    ParquetIO.readOrEmpty(spark, path, Trainer.LedgerSchema)

  test("3-batch fold ≡ scalar sequential steps; replay idempotent; conflict guard loud") {
    val root = java.nio.file.Files.createTempDirectory("graft_sgd")
    val (ledger, out) = (root.resolve("l").toString, root.resolve("o").toString)
    b.zipWithIndex.foreach { case (rows, i) =>
      Trainer.sgdIngestBatch(df(rows), ledger, out, i.toLong)
    }
    val want = b.scanLeft(Vector(0L, 0L, 0L))(
      (w, rows) => scalarStep(rows, w)).drop(1)
    def got() = ledgerRows(ledger).dropDuplicates()
      .orderBy("batch_id").collect()
      .map(r => Vector(r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got() == want, s"fold diverged: ${got()} vs $want")
    // crash-replay of the middle batch (perturbed layout): nothing moves
    Trainer.sgdIngestBatch(df(b(1)).repartition(5), ledger, out, 1L)
    assert(got() == want, "replay changed the trajectory")
    assert(Trainer.latestWeights(ledgerRows(ledger))
      .collect().head.toSeq == want.last.toSeq, "latestWeights diverged")
    // misuse — a different batch re-shipping an id with different weights
    // — must fail LOUDLY at read, never pick a survivor
    ledgerRows(ledger).limit(1)
      .select(col("batch_id"), col("n"), (col("w0") + 1L).as("w0"),
        col("w1"), col("w2"), col("sae6"))
      .write.mode("append").parquet(ledger)
    val thrown = intercept[IllegalArgumentException] {
      Trainer.latestWeights(ledgerRows(ledger)).collect()
    }
    assert(thrown.getMessage.contains("conflicting"), thrown.getMessage)
  }

  test("same batch fed K times ≡ quality_train's K-epoch trajectory (shared step)") {
    // a real corpus fixture so the registered query and the ingest path
    // derive features identically
    val longText = (1 to 150).map(i => s"w$i").mkString(" ")
    val docs = (1L to 3L).map(i => (i, "en", longText)) ++
      (4L to 6L).map(i => (i, "de", "a b c d e"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sgd_eq").toString
    docs.map { case (id, lang, t) => (id, t, lang, "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val feats = docs.map { case (_, lang, t) =>
      val tok = t.trim.split("\\s+").length.toLong
      (if (lang == "en") 1L else 0L, 1L,
        math.min(t.length.toLong, 2000L) / 100L, math.min(tok, 200L) / 10L)
    }
    val root = java.nio.file.Files.createTempDirectory("graft_sgd_eq2")
    val (ledger, out) = (root.resolve("l").toString, root.resolve("o").toString)
    (1L to 4L).foreach(i => Trainer.sgdIngestBatch(df(feats), ledger, out, i))
    val ledgerW = ledgerRows(ledger).orderBy("batch_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val epochW = graft.SparkEntry.queries("quality_train")(spark, dir)
      .orderBy("epoch").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(ledgerW == epochW,
      s"K identical batches must reproduce the K epochs: $ledgerW vs $epochW")
  }

  // ---- hashed-feature SGD at ingest (the production-shaped filter) ----

  private val hfeats = Seq(
    (1L, 1L, -1L, 1000000L), (1L, 1L, 3L, 500000L), (1L, 1L, 7L, 250000L),
    (2L, 0L, -1L, 1000000L), (2L, 0L, 5L, 400000L),
    (3L, 1L, -1L, 1000000L), (3L, 1L, 3L, 300000L),
    (4L, 0L, -1L, 1000000L), (4L, 0L, 7L, 100000L))

  private def hdf(rows: Seq[(Long, Long, Long, Long)]): DataFrame =
    rows.toDF("doc_id", "y", "slot", "x6")

  private def hashedLedgerAt(path: String, id: Long): Seq[(Long, Long)] =
    ParquetIO.readOrEmpty(spark, path, Trainer.HashedLedgerSchema)
      .dropDuplicates().filter(col("batch_id") === id)
      .orderBy("slot").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq

  private def wRows(df: DataFrame): Seq[(Long, Long)] =
    df.orderBy("slot").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("hashed: same batch fed K times ≡ hashedEpochs' K epochs (shared step)") {
    val feats = hdf(hfeats)
    val stats = Trainer.hashedStats(feats)
    val root = java.nio.file.Files.createTempDirectory("graft_sgdh_eq")
    val (ledger, out) = (root.resolve("l").toString, root.resolve("o").toString)
    (0L to 3L).foreach(i =>
      Trainer.hashedSgdIngestBatch(feats, stats, ledger, out, i))
    val (_, eps) = Trainer.hashedEpochs(feats, 4)
    eps.zipWithIndex.foreach { case (w, i) =>
      assert(hashedLedgerAt(ledger, i.toLong) == wRows(w),
        s"ingest batch $i diverged from epoch ${i + 1}")
    }
    // crash-replay of a MIDDLE batch (perturbed layout): as-of batch_id−1
    // weights make the rewrite byte-identical — nothing moves
    val before = (0L to 3L).map(hashedLedgerAt(ledger, _))
    Trainer.hashedSgdIngestBatch(feats.repartition(5), stats, ledger, out, 1L)
    assert((0L to 3L).map(hashedLedgerAt(ledger, _)) == before,
      "replay changed the hashed trajectory")
    assert(wRows(Trainer.latestHashedWeights(
        ParquetIO.readOrEmpty(spark, ledger, Trainer.HashedLedgerSchema))) ==
      wRows(eps.last), "latestHashedWeights diverged from the last epoch")
  }

  test("hashed: empty batch against NONZERO weights holds them") {
    val feats = hdf(hfeats)
    val stats = Trainer.hashedStats(feats)
    val root = java.nio.file.Files.createTempDirectory("graft_sgdh_empty")
    val (ledger, out) = (root.resolve("l").toString, root.resolve("o").toString)
    Trainer.hashedSgdIngestBatch(feats, stats, ledger, out, 0L)
    val w0 = hashedLedgerAt(ledger, 0L)
    assert(w0.exists(_._2 != 0L), "degenerate fixture: batch 0 trained to zero")
    Trainer.hashedSgdIngestBatch(hdf(Nil), stats, ledger, out, 1L)
    assert(hashedLedgerAt(ledger, 1L) == w0,
      "empty hashed batch moved the standing weights")
    // and the next real batch steps from the HELD weights
    val b2 = hdf(hfeats.take(3))
    Trainer.hashedSgdIngestBatch(b2, stats, ledger, out, 2L)
    val want2 = wRows(Trainer.hashedStep(Trainer.hashedDocs(b2),
      w0.toDF("slot", "w"), stats))
    assert(hashedLedgerAt(ledger, 2L) == want2,
      "post-empty batch did not step from the held weights")
  }

  test("hashed ledger conflict guard fails loudly on diverging replays") {
    val feats = hdf(hfeats)
    val stats = Trainer.hashedStats(feats)
    val root = java.nio.file.Files.createTempDirectory("graft_sgdh_conf")
    val (ledger, out) = (root.resolve("l").toString, root.resolve("o").toString)
    Trainer.hashedSgdIngestBatch(feats, stats, ledger, out, 0L)
    ParquetIO.readOrEmpty(spark, ledger, Trainer.HashedLedgerSchema)
      .limit(1).select(col("batch_id"), col("slot"), (col("w") + 1L).as("w"))
      .write.mode("append").parquet(ledger)
    val thrown = intercept[IllegalArgumentException] {
      Trainer.latestHashedWeights(
        ParquetIO.readOrEmpty(spark, ledger, Trainer.HashedLedgerSchema)).collect()
    }
    assert(thrown.getMessage.contains("conflicting"), thrown.getMessage)
  }

  test("empty batch against NONZERO weights holds them (no silent reset)") {
    // direct step: the regression shape was max(w)->NULL->coalesce(0)
    val w = Seq((7L, -3L, 11L)).toDF("w0", "w1", "w2")
    val out = Trainer.step(df(Nil), w).collect().head
    assert(out.toSeq == Seq(0L, 7L, -3L, 11L, 0L),
      s"empty step must hold weights: ${out.toSeq}")
    // through the ingest seam: a dry micro-batch between two real ones
    // must leave the trajectory exactly 'hold at batch 0's weights'
    val root = java.nio.file.Files.createTempDirectory("graft_sgd_empty")
    val (ledger, outP) = (root.resolve("l").toString, root.resolve("o").toString)
    Trainer.sgdIngestBatch(df(b(0)), ledger, outP, 0L)
    Trainer.sgdIngestBatch(df(Nil), ledger, outP, 1L)
    Trainer.sgdIngestBatch(df(b(2)), ledger, outP, 2L)
    val got = ledgerRows(ledger).dropDuplicates().orderBy("batch_id").collect()
      .map(r => Vector(r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val w0 = scalarStep(b(0), Vector(0L, 0L, 0L))
    val want = Seq(w0, w0, scalarStep(b(2), w0))
    assert(got == want, s"empty batch corrupted the fold: $got vs $want")
  }
}
