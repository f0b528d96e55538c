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
}
