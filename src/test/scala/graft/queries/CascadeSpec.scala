package graft.queries

import graft.SparkSpec

/** `dedup_cascade` on a hand corpus where each stage's removals are
  * known: docs 1,2 identical (exact stage), docs 3,7 near-identical
  * (minhash stage), doc 9 unique; embeddings orthogonal (semantic stage
  * removes nothing — singleton clusters at the fixture's scale). Also
  * pins the funnel invariants the report is for: stages chain
  * (n_out(k) = n_in(k+1)) and counts are consistent. doc_ids avoid the
  * planting residues (% 20, % 25), so planted(corpus) = corpus. */
class CascadeSpec extends SparkSpec {
  import spark.implicits._

  test("cascade stage 1 ≡ scalar planted-distinct reference; funnel chains on random tie-heavy corpora") {
    // Random corpora over a 4-token vocabulary of 3-token sentences →
    // heavy exact-text ties; doc_ids land on the planting residues too,
    // so the scalar reference replicates Dedup.planted's rule verbatim.
    val gen = org.scalacheck.Gen.listOfN(15, for {
      id <- org.scalacheck.Gen.choose(0L, 60L)
      toks <- org.scalacheck.Gen.listOfN(3,
        org.scalacheck.Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield (id, toks.mkString(" ")))
    (1 to 6).foreach { i =>
      val docs = gen.sample.get.groupBy(_._1).map(_._2.head).toSeq // ids unique
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cascp$i").toString
      docs.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Seq((docs.head._1, Array(1f, 0f)), (docs.last._1, Array(0f, 1f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // scalar planted + distinct reference for stage 1
      val planted = docs ++
        docs.filter(_._1 % 20 == 0).map { case (id, t) => (id + 1000000L, t) } ++
        docs.filter(_._1 % 25 == 0).map { case (id, t) =>
          (id + 2000000L, t.replaceFirst("^\\S+", "REPLACED")) }
      val rows = graft.SparkEntry.queries("dedup_cascade")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(rows("1_exact") ==
        ((planted.size.toLong,
          (planted.size - planted.map(_._2).distinct.size).toLong,
          planted.map(_._2).distinct.size.toLong)),
        s"case $i stage 1: ${rows("1_exact")} vs scalar over $planted")
      // funnel invariants hold whatever the hash stages removed
      assert(rows("1_exact")._3 == rows("2_minhash")._1 &&
        rows("2_minhash")._3 == rows("3_semantic")._1, s"case $i chaining")
      assert(Seq("1_exact", "2_minhash", "3_semantic").forall { k =>
        val (nIn, rm, nOut) = rows(k); rm >= 0 && nOut == nIn - rm
      }, s"case $i count consistency")
    }
  }

  test("cascade fixture: exact removes the copy, minhash the near-dup; funnel chains") {
    val exact = (1 to 30).map(i => s"e$i").mkString(" ")
    val base = (1 to 30).map(i => s"c$i").mkString(" ")
    val near = (1 to 29).map(i => s"c$i").mkString(" ") + " zz" // 1 token off
    val docs = Seq(
      (1L, exact), (2L, exact),                       // exact pair
      (3L, base), (7L, near),                         // near pair (disjoint tokens)
      (9L, (1 to 30).map(i => s"u$i").mkString(" "))) // unique
    val dir = java.nio.file.Files.createTempDirectory("graft_cascade").toString
    docs.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, Array(1f, 0f, 0f)), (3L, Array(0f, 1f, 0f)), (9L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.SparkEntry.queries("dedup_cascade")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("1_exact") == ((5L, 1L, 4L)), s"exact: ${rows("1_exact")}")
    assert(rows("2_minhash") == ((4L, 1L, 3L)), s"minhash: ${rows("2_minhash")}")
    val (n3, d3, o3) = rows("3_semantic")
    assert(n3 == 3L && d3 == 0L && o3 == 3L, s"semantic: ${rows("3_semantic")}")
    // funnel invariant, explicitly
    assert(rows("1_exact")._3 == rows("2_minhash")._1 &&
      rows("2_minhash")._3 == rows("3_semantic")._1)
  }

  test("cascade at ingest ≡ inline cascade fold (frozen centroids); every stage fires; replay idempotent") {
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, Similarity}
    val A = (1 to 30).map(i => s"e$i").mkString(" ")
    val B = (1 to 30).map(i => s"c$i").mkString(" ")
    val nearA = (1 to 29).map(i => s"e$i").mkString(" ") + " zz"
    val nearB = (1 to 29).map(i => s"c$i").mkString(" ") + " yy"
    val C = (1 to 30).map(i => s"u$i").mkString(" ")
    val D = (1 to 30).map(i => s"w$i").mkString(" ")
    // doc_ids non-decreasing across batches; no in-batch stage-2/3 pairs
    val batches = Seq(
      Seq((1L, A), (2L, A), (3L, B)),
      Seq((10L, A), (11L, nearB), (12L, C)),
      Seq((20L, nearA), (21L, D)))
    val embs = Map(1L -> Array(1f, 0f, 0f), 3L -> Array(0f, 1f, 0f),
      12L -> Array(0.97f, 0.2f, 0f))
    val cents = Seq((0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0)))
      .toDF("c_id", "c_emb")
    def embDf(docs: Seq[(Long, String)]) = {
      val rows = docs.flatMap { case (id, _) => embs.get(id).map(id -> _) }
      if (rows.isEmpty) Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
      else rows.toDF("vec_id", "embedding")
    }
    val root = java.nio.file.Files.createTempDirectory("graft_cascing")
    val (idx, out) = (root.resolve("idx").toString, root.resolve("out").toString)
    batches.zipWithIndex.foreach { case (docs, i) =>
      Dedup.cascadeIngestBatch(docs.toDF("doc_id", "text"), embDf(docs),
        cents, idx, out, i.toLong, cosineThreshold = 0.9)
    }
    def ingested(): Map[Long, String] =
      spark.read.parquet(out).select("doc_id", "stage").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    // inline fold over the concatenated corpus, same frozen centroids
    val all = batches.flatten.toDF("doc_id", "text")
    val surv1 = all.groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "text")
    val sh = Dedup.shingleRows(surv1).localCheckpoint()
    val drops2 = Dedup.minhashPairsIndexed(
        Dedup.bandedSignatures(sh), sh.distinct(), 0.7)
      .select(col("id_b").as("doc_id")).distinct()
    val surv2 = surv1.join(drops2, Seq("doc_id"), "left_anti")
    val assigned = Similarity.assignToCentroids(
      embDf(batches.flatten).join(surv2.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi"), cents)
    val aa = assigned.select(col("c_id"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val bb = assigned.select(col("c_id"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val drops3 = aa.join(bb.hint("shuffle_hash"), "c_id")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        graft.functions.VectorOps.cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= 0.9)
      .select(col("id_b").as("doc_id")).distinct()
    val (s1Set, d2Set, d3Set) = (
      surv1.collect().map(_.getLong(0)).toSet,
      drops2.collect().map(_.getLong(0)).toSet,
      drops3.collect().map(_.getLong(0)).toSet)
    val inline = batches.flatten.map { case (id, _) =>
      id -> (if (!s1Set.contains(id)) "1_exact"
             else if (d2Set.contains(id)) "2_minhash"
             else if (d3Set.contains(id)) "3_semantic"
             else "kept")
    }.toMap
    assert(ingested() == inline,
      s"ingested fold diverged from inline cascade:\n${ingested()}\nvs\n$inline")
    // the fixture exercises EVERY verdict, cross-batch
    val byStage = inline.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(byStage("1_exact") == Set(2L, 10L), byStage.toString)
    assert(byStage("2_minhash") == Set(11L, 20L), byStage.toString)
    assert(byStage("3_semantic") == Set(12L), byStage.toString)
    assert(byStage("kept") == Set(1L, 3L, 21L), byStage.toString)
    // crash-replay of the middle batch (perturbed layout): nothing moves
    Dedup.cascadeIngestBatch(
      batches(1).toDF("doc_id", "text").repartition(5), embDf(batches(1)),
      cents, idx, out, 1L, cosineThreshold = 0.9)
    assert(ingested() == inline, "replay changed the verdicts")
  }
}
