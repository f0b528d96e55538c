package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CorpusBuild]] — the end-to-end corpus build on the ingest seam:
  * fixture-exact per-stage verdicts (each cascade stage + the frozen
  * filter fires on exactly the doc planted for it), BATCHING INVARIANCE
  * (3-batch fold ≡ 2-batch fold under the contract: in-batch exact dups
  * allowed, in-batch near-dups upstream's job, doc_ids non-decreasing),
  * crash-replay idempotence through readout and compaction, and
  * langledger ≡ survivors consistency (the slim rates source can never
  * drift from the per-doc component it summarizes). */
class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  private val w30 = (1 to 30).map(i => s"w$i")
  private val docs = Map[Long, (String, String)](
    1L -> ("alpha beta gamma delta epsilon zeta", "en"),
    2L -> (w30.mkString(" "), "en"),
    3L -> ("red green blue yellow purple orange", "de"),
    4L -> ("red green blue yellow purple orange", "de"), // in-batch exact dup of 3
    11L -> ("alpha beta gamma delta epsilon zeta", "en"), // exact dup of standing 1
    12L -> ((w30.dropRight(1) :+ "CHANGED").mkString(" "), "en"), // near-dup of 2
    13L -> ("совершенно unrelated токены здесь пять слов", "de"), // semantic dup of 3
    14L -> ("too short here", "en"), // fails the quality rule (<5 tokens? 3 tokens)
    21L -> ("the quick brown fox jumps over dogs", "en"),
    22L -> ("un deux trois quatre cinq six sept", "fr"))

  private def frame(ids: Seq[Long]): DataFrame =
    ids.map(id => (id, docs(id)._1, docs(id)._2)).toDF("doc_id", "text", "lang")

  private val emb = Seq(
    (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0f, 1f)),
    (13L, Array(0f, 0.14f, 0.99f))).toDF("vec_id", "embedding")
  private def cents = Seq(
    (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0)),
    (2L, Array(0.0, 0.0, 1.0))).toDF("c_id", "c_emb")

  // frozen "trained filter": keep docs with ≥ 5 whitespace tokens
  private val score: DataFrame => DataFrame =
    surv => surv.filter(size(split(col("text"), "\\s+")) >= 5).select("doc_id")

  private def ingest(root: String, ids: Seq[Long], id: Long): Unit =
    CorpusBuild.ingestBatch(frame(ids), emb, cents, score,
      s"$root/idx", s"$root/out", id)

  private def verdicts(root: String): Map[Long, String] =
    spark.read.parquet(s"$root/out").select("doc_id", "stage")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def fold3(root: String): Unit = {
    ingest(root, Seq(1L, 2L, 3L, 4L), 0L)
    ingest(root, Seq(11L, 12L, 13L, 14L), 1L)
    ingest(root, Seq(21L, 22L), 2L)
  }

  test("each stage fires on exactly the doc planted for it") {
    val root = java.nio.file.Files.createTempDirectory("graft_cbi_fx").toString
    fold3(root)
    assert(verdicts(root) == Map(
      1L -> "kept", 2L -> "kept", 3L -> "kept", 4L -> "1_exact",
      11L -> "1_exact", 12L -> "2_minhash", 13L -> "3_semantic",
      14L -> "4_quality", 21L -> "kept", 22L -> "kept"))
    val out = CorpusBuild.readout(spark, s"$root/idx", s"$root/out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byStage = out.map(t => t._1 -> t).toMap
    assert(byStage("1_exact") == ("1_exact", 10L, 2L, 8L))
    assert(byStage("2_minhash") == ("2_minhash", 8L, 1L, 7L))
    assert(byStage("3_semantic") == ("3_semantic", 7L, 1L, 6L))
    assert(byStage("4_quality") == ("4_quality", 6L, 1L, 5L))
    assert(byStage("5_sample")._2 == 5L)
    // funnel coherence downstream: pack consumes exactly the sampled set
    assert(byStage("6_pack")._2 == byStage("5_sample")._4)
    val shardDocs = out.filter(_._1.startsWith("7_shard_")).map(_._2).sum
    assert(shardDocs == byStage("5_sample")._4)
  }

  test("3-batch fold ≡ 2-batch fold (batching invariance under the contract)") {
    val a = java.nio.file.Files.createTempDirectory("graft_cbi_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_cbi_b").toString
    fold3(a)
    ingest(b, Seq(1L, 2L, 3L, 4L), 0L)
    ingest(b, Seq(11L, 12L, 13L, 14L, 21L, 22L), 1L)
    assert(verdicts(a) == verdicts(b), "per-doc verdicts depend on batching")
    assert(rows(CorpusBuild.readout(spark, s"$a/idx", s"$a/out")) ==
      rows(CorpusBuild.readout(spark, s"$b/idx", s"$b/out")),
      "readout depends on batching")
  }

  test("crash-replay of a kept-docs batch changes nothing; compaction restores size") {
    val root = java.nio.file.Files.createTempDirectory("graft_cbi_r").toString
    fold3(root)
    val out0 = rows(CorpusBuild.readout(spark, s"$root/idx", s"$root/out"))
    def survCount() = ParquetIO.readOrEmpty(spark, s"$root/idx/survivors",
      CorpusBuild.SurvivorSchema).count()
    val surv0 = survCount()
    // batch 2 keeps docs 21/22, so its replay must INFLATE the
    // append-armored components (else the armor is untested) while the
    // dedup-tolerant readout holds
    (1 to 3).foreach(_ => ingest(root, Seq(21L, 22L), 2L))
    assert(survCount() > surv0, "replay did not inflate the survivors component")
    assert(rows(CorpusBuild.readout(spark, s"$root/idx", s"$root/out")) == out0,
      "replay duplicates leaked into the readout")
    CorpusBuild.compactIndex(spark, s"$root/idx")
    assert(survCount() == surv0,
      "compaction did not restore the never-replayed size")
    assert(rows(CorpusBuild.readout(spark, s"$root/idx", s"$root/out")) == out0,
      "compaction changed the readout")
  }

  test("langledger ≡ survivors (the slim rates source cannot drift)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cbi_l").toString
    fold3(root)
    val fromLedger = ParquetIO.readOrEmpty(spark, s"$root/idx/langledger",
        CorpusBuild.LangLedgerSchema).dropDuplicates()
      .groupBy("lang").agg(sum("n_docs").as("n"), sum("toks").as("t"))
      .orderBy("lang").collect().map(_.toString).toSeq
    val fromSurv = ParquetIO.readOrEmpty(spark, s"$root/idx/survivors",
        CorpusBuild.SurvivorSchema).dropDuplicates()
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(fromLedger == fromSurv)
  }
}
