package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Pins the non-oracle extension operators: MinHash/SimHash near-dup
  * recall on the planted duplicates, IVF vs brute-force ANN, rolling hash,
  * multimodal decode plumbing. */
class ExtSpec extends SparkSpec {

  private def docs = table(spark, sf("sf0.001"), "documents")
  private def embs = table(spark, sf("sf0.001"), "embeddings")

  test("shingleRows slice-zip form ≡ window-lead reference (k = 1..4)") {
    // the r16 optimization replaced the posexplode + window-`lead` row
    // form (one token-stream Exchange + sort per shingling pass) with the
    // codegen'd gramZip slice-zip; this pins multiset equality per doc
    // against an inline copy of the OLD form over the real corpus —
    // including the short-doc (< k tokens) and planted-duplicate edges
    val corpus = Dedup.planted(docs)
    for (k <- 1 to 4) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val tk = corpus.select(col("doc_id"),
        posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "t0")))
      val withLeads = (1 until k).foldLeft(tk)((d, i) =>
        d.withColumn(s"t$i", lead("t0", i).over(w)))
      val reference = withLeads.filter(col(s"t${k - 1}").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", (0 until k).map(i => col(s"t$i")): _*).as("s"))
        .groupBy("doc_id", "s").count()
      val current = Dedup.shingleRows(corpus, k).groupBy("doc_id", "s").count()
      val (nRef, nCur) = (reference.count(), current.count())
      assert(nCur == nRef &&
        current.unionByName(reference).distinct().count() == nRef,
        s"k=$k: slice-zip shingles differ from the window-lead reference")
    }
  }

  // ---------------------------------------- r17 narrow-form equivalences
  /** Edge corpus for the per-row rewrites: empty / whitespace-only text,
    * sub-k docs, all-duplicate tokens, exact chunk-boundary lengths,
    * mixed-case stopwords, digit/punct tokens, a long periodic doc. */
  private def edgeDocs = {
    import spark.implicits._
    Seq(
      (9000001L, ""),
      (9000002L, "   "),
      (9000003L, "one"),
      (9000004L, "a a"),
      (9000005L, "x y z"),
      (9000006L, "w w w w w w w w w w w"),
      (9000007L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (9000008L, (1 to 11).map(i => s"t$i").mkString(" ")),
      (9000009L, "The THE the of OF and that xyzzy 123 !? a1 1a 11 , ..."),
      (9000010L, ("tick tock " * 30).trim)
    ).toDF("doc_id", "text")
  }
  private def pinCorpus = docs.select("doc_id", "text").unionByName(edgeDocs)

  private def assertSameRows(current: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val (nCur, nRef) = (current.count(), reference.count())
    assert(nCur == nRef &&
      current.unionByName(reference).distinct().count() == nRef,
      s"$what: narrow form differs from the reference ($nCur vs $nRef rows)")
  }

  test("repetitionStats per-row form ≡ explode+agg reference") {
    val corpus = pinCorpus
    val toks = corpus.select(col("doc_id"),
      explode(Dedup.tokens(col("text"))).as("t"))
    val tstats = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct("t").as("n_tok_d"))
    val sstats = Dedup.shingleRows(corpus, 3).groupBy("doc_id")
      .agg(count(lit(1)).as("n_3g"), countDistinct("s").as("n_3g_d"))
    val reference = corpus.select("doc_id")
      .join(tstats, Seq("doc_id"), "left")
      .join(sstats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) - col("n_tok_d").cast("double") / col("n_tok"),
          lit(0.0)), 6).as("dup_token_frac"),
        round(coalesce(lit(1.0) - col("n_3g_d").cast("double") / col("n_3g"),
          lit(0.0)), 6).as("dup_3gram_frac"))
    assertSameRows(TextStats.repetitionStats(corpus), reference, "repetitionStats")
  }

  test("gopherTokenStats per-row form ≡ explode+agg reference") {
    val corpus = pinCorpus
    val reference = corpus
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("t"))).as("sum_len"),
        sum(when(col("t").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
        countDistinct(when(col("t").isin(TextStats.GopherStops: _*), col("t")))
          .as("n_stop"))
    assertSameRows(TextStats.gopherTokenStats(corpus), reference, "gopherTokenStats")
  }

  test("winnow fingerprints expression ≡ window-min reference (k,w sweeps)") {
    val corpus = pinCorpus
    for ((k, w) <- Seq((4, 5), (2, 3), (3, 4), (1, 1))) {
      val grams = corpus
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) >= k)
        .select(col("doc_id"),
          posexplode(Dedup.gramZip(col("t"), k)).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"),
          md5(Dedup.gramString(col("g"), k).cast("binary")).as("h"))
      val keyed = grams.withColumn("kq", concat(col("h"),
        lpad((lit(1000000) - col("pos")).cast("string"), 7, "0")))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
      val reference = keyed
        .withColumn("sel", min("kq").over(win))
        .filter(col("pos") >= w)
        .select(col("doc_id"), col("sel")).distinct()
        .withColumn("fh", substring(col("sel"), 1, 32))
      assertSameRows(Winnow.fingerprints(corpus, k, w), reference,
        s"winnow fingerprints k=$k w=$w")
    }
  }

  test("chunkRows regex form ≡ posexplode+groupBy reference (ct = 3, 10)") {
    val corpus = pinCorpus
    for (ct <- Seq(3, 10)) {
      val tok = corpus.select(col("doc_id"),
        posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "t")))
      val orderedTokens = concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("t")))),
        x => x.getField("t")))
      val reference = tok
        .withColumn("chunk_id", (col("pos") / ct).cast("long"))
        .groupBy("doc_id", "chunk_id")
        .agg(orderedTokens.as("chunk"))
      assertSameRows(Dedup.chunkRows(corpus, ct), reference, s"chunkRows ct=$ct")
    }
  }

  test("lineDedup min-struct first-occurrence ≡ row_number window reference") {
    val corpus = pinCorpus
    val chunks = Dedup.chunkRows(Dedup.planted(corpus), 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk").orderBy("doc_id", "chunk_id")
    val flagged = chunks.withColumn("rn", row_number().over(w))
    val keptOrdered = concat_ws(" ", transform(
      array_sort(collect_list(when(col("rn") === 1,
        struct(col("chunk_id"), col("chunk"))))),
      x => x.getField("chunk")))
    val reference = flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        md5(keptOrdered.cast("binary")).as("kept_fp"))
    assertSameRows(Dedup.lineDedup(corpus), reference, "lineDedup")
  }

  test("ADC pinned subspace sum ≡ ordered collect fold (random doubles)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for (key <- 1 to 50; s <- 0 until 8)
      yield (key, s, (rnd.nextDouble() - 0.5) * 1e3)
    val df = rows.toDF("key", "s", "qdot")
    val current = df.groupBy("key").agg(Similarity.pinnedSubspaceSum(8).as("adot"))
    val reference = df.groupBy("key")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("s"), col("qdot")))),
          e => e.getField("qdot")),
        lit(0.0), (acc, x) => acc + x).as("adot"))
    assertSameRows(current, reference, "pinnedSubspaceSum")
  }

  test("minhash: catches every planted exact dup, only verified pairs emitted") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expectedExact = docs.filter(col("doc_id") % 20 === 0)
      .filter(size(Dedup.shingles(col("text"))) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val found = pairs.collect { case (a, b, _) if b == a + 1000000 => a }.toSet
    assert(expectedExact.subsetOf(found),
      s"missed exact dups: ${expectedExact -- found}")
    assert(pairs.forall(_._3 >= 0.7), "pair below verification threshold")
  }

  test("minhash: catches most planted near-dups (one-token mutation)") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.filter(col("doc_id") % 25 === 0)
      .filter(size(split(col("text"), "\\s+")) >= 20)
      .select("doc_id").collect().map(_.getLong(0))
    val caught = planted.count(id => pairs.contains((id, id + 2000000)))
    assert(caught >= planted.length * 0.8,
      s"near-dup recall too low: $caught/${planted.length}")
  }

  test("simhash: exact dups at hamming 0, all pairs within threshold") {
    val pairs = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.filter(p => p._1 < 1000000 && p._2 == p._1 + 1000000)
    assert(exact.nonEmpty && exact.forall(_._3 == 0))
    assert(pairs.forall(_._3 <= 3))
  }

  test("ivf ANN: valid shape and bounded by brute-force scores") {
    val brute = Similarity.bruteTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val ivf = Similarity.ivfTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ivf.map(_._1).distinct.length == 8)
    assert(ivf.groupBy(_._1).forall(_._2.length == 5))
    val bruteBest = brute.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    assert(ivf.forall { case (q, _, c) => c <= bruteBest(q) + 1e-9 })
    val bruteSet = brute.map(p => (p._1, p._2)).toSet
    val recall = ivf.count(p => bruteSet.contains((p._1, p._2))).toDouble / brute.length
    info(f"IVF recall@5 vs brute: $recall%.2f (nlist=16, nprobe=4, random data)")
    assert(recall > 0.0)
  }

  test("lsh ANN: valid shape, scores bounded by brute force") {
    val brute = Similarity.bruteTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val lsh = Similarity.lshTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(lsh.nonEmpty)
    assert(lsh.groupBy(_._1).forall(_._2.length <= 5))
    val bruteBest = brute.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    assert(lsh.forall { case (q, _, c) => c <= bruteBest(q) + 1e-9 })
    val bruteSet = brute.map(p => (p._1, p._2)).toSet
    val recall = lsh.count(p => bruteSet.contains((p._1, p._2))).toDouble / brute.length
    info(f"LSH recall@5 vs brute: $recall%.2f (4 tables × 8 bits, random data)")
  }

  test("knn graph: well-formed per-vector top-5, bounded by brute, planted copies surface") {
    val out = graft.SparkEntry.queries("sim_knn_graph")(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.forall(_._3 != q), s"self edge for $q")
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"ranks not dense-from-1 for $q")
      assert(rows.length <= 5)
    }
    // graph scores can never beat the exact per-query best (probe set)
    val brute = Similarity.bruteTopK(embs).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val bruteBest = brute.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).max }
    out.filter(p => bruteBest.contains(p._1)).foreach { case (q, _, _, c) =>
      assert(c <= bruteBest(q) + 1e-9, s"graph beat brute for $q") }
    // planted exact copies share centroid distances — and therefore cells —
    // BY CONSTRUCTION: the copy→original edge must surface at cosine 1.0
    val dups = embs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val g = Similarity.knnGraph(embs.unionByName(dups), nlist = 16).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val ids = embs.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      val hit = g.find(p => p._1 == id + 100000L && p._2 == id)
      assert(hit.isDefined, s"copy ${id + 100000L} missing its original in top-5")
      assert(hit.get._3 == 1.0)
    }
  }

  test("embedding near-dup: bucketed candidates+verify vs exact all-pairs baseline") {
    val brute = Dedup.embeddingNearDup(embs, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupBucketed(embs, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bucketedSet = bucketed.map(p => (p._1, p._2)).toSet
    // precision is exact by construction (every emitted pair is cosine-verified)
    assert(bucketedSet.subsetOf(brute), "bucketed emitted a pair below threshold")
    assert(bucketed.forall(_._3 >= 0.3))
    val recall = bucketedSet.size.toDouble / brute.size
    info(f"bucketed recall vs exact: $recall%.2f (sqrt-n buckets, nprobe=2, random data)")
    assert(recall >= 0.3, f"blocked-dedup recall collapsed: $recall%.2f (0.40 at pin time)")
    // deterministic monotonicity: probing more buckets assigns a superset
    // of clusters per vector, so the verified pair set can only grow — a
    // centroid-assignment regression that shrinks candidates breaks this
    val wider = Dedup.embeddingNearDupBucketed(embs, 0.3, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketedSet.subsetOf(wider),
      "nprobe=4 lost pairs that nprobe=2 found — multi-probe assignment broken")
    assert(wider.subsetOf(brute))
    info(f"recall at nprobe=4: ${wider.size.toDouble / brute.size}%.2f")
  }

  test("embedding near-dup: every planted exact duplicate is caught (the dedup target)") {
    // random-pair recall (above) is the pessimistic bound; the operator's
    // real prey is near-identical vectors, which share centroid distances
    // and therefore buckets BY CONSTRUCTION — recall on them must be 1.0
    val dups = embs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val planted = embs.unionByName(dups)
    val pairs = Dedup.embeddingNearDupBucketed(planted, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = embs.filter(col("vec_id") % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed planted duplicates: ${expected -- pairs}")
  }

  test("semantic dedup: exact match of the brute-force SemDeDup rule") {
    val nlist = 8
    val tau = 0.1
    val out = Dedup.semanticDedup(embs, tau, nlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // independent brute-force: collected assignment + Scala cosines with
    // Spark's exact HALF_UP 6-dp rounding, then the keep-lowest-id rule
    val cluster = Similarity.assignClusters(embs, nlist)
      .select("vec_id", "c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = embs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = for {
      b <- ids
      mates = ids.filter(a => a < b && cluster(a) == cluster(b))
        .map(a => (a, cos(vecs(a), vecs(b)))).filter(_._2 >= tau)
      if mates.nonEmpty
      (wit, c) = mates.minBy { case (a, s) => (-s, a) }
    } yield (b, cluster(b), wit, c)
    assert(out.toSet == expected.toSet,
      s"drop set mismatch: spark-only=${out.toSet -- expected.toSet} " +
        s"brute-only=${expected.toSet -- out.toSet}")
    assert(out.nonEmpty, "fixture degenerated: no drops at tau=0.1")
    // exemplar safety: the lowest-id member of a cluster is never dropped
    val minPerCluster = cluster.groupBy(_._2).map { case (_, m) => m.keys.min }.toSet
    assert(out.forall(d => !minPerCluster.contains(d._1)),
      "a cluster's lowest-id exemplar was dropped")
  }

  test("hybrid RRF: exact match of a collected-leg recompute; single-leg docs keep null rank") {
    val terms = Seq("hash", "join", "scan", "vector", "stream")
    val k = 10; val rrfK = 60
    val out = HybridSearch.hybridRrf(docs, embs, terms, k = k, topN = 15, rrfK = rrfK)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
    // independent fuse: rank each leg's collected top-k by (score desc,
    // id asc), RRF in plain Scala, same 6-dp rounding
    // qId (= 0) is post-filtered from the ranked lexical list, same as
    // the operator: corpus stats keep the query doc, results never do.
    // BM25 fetches k+1 then truncates to k after the exclusion, so the
    // lexical leg contributes exactly k candidates even when the query
    // doc lands in its own top list (leg symmetry with the dense side).
    val lex = TextStats.bm25(docs, terms, k + 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 != 0L)
      .sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val vecs = embs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val r = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val den = vecs.keys.filter(_ != 0L).toSeq
      .map(id => (id, cos(vecs(0L), vecs(id))))
      .sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (lex.keySet ++ den.keySet).toSeq.map { id =>
      val r = lex.get(id).map(x => 1.0 / (rrfK + x)).getOrElse(0.0) +
        den.get(id).map(x => 1.0 / (rrfK + x)).getOrElse(0.0)
      (id, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        lex.get(id), den.get(id))
    }.sortBy { case (id, r, _, _) => (-r, id) }.take(15)
    assert(out.toSeq == expected,
      s"fusion mismatch:\n spark=${out.toSeq}\n brute=$expected")
    // both legs contribute: at least one fused doc must be single-leg
    // (null in one rank) and at least one in both, else the fixture is
    // degenerate and the outer-join path untested
    assert(out.exists(r => r._3.isEmpty || r._4.isEmpty))
    assert(out.exists(r => r._3.nonEmpty && r._4.nonEmpty) ||
      (lex.keySet & den.keySet).isEmpty)
  }

  test("weighted sample: exact match of the brute-force A-ES selection") {
    val k = 12
    val out = Sampling.weightedSample(docs, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // brute force: same quality + md5-uniform + key arithmetic in Scala
    val base = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        TextStats.qualityScore(org.apache.spark.sql.functions.col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = base.map { case (id, q) =>
      val h = md5hex(s"$id#wrs42")
      val uval = h.take(6).foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
      val u = (uval + 0.5) / 16777216.0
      val key = BigDecimal(-math.log(u) / (q + 0.05))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, q, key)
    }.sortBy { case (id, _, key) => (key, id) }.take(k).toSeq
    assert(out.toSeq == expected,
      s"A-ES selection diverged:\n got=${out.toSeq}\n exp=$expected")
    // all keys finite (the +0.05 weight floor) and the pick is a strict
    // subset ordered by key
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted)
  }

  test("index health audit: brute recompute over the served index; full centroid grid") {
    val d = sf("sf0.001")
    val out = graft.SparkEntry.queries("index_health_audit")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val n = embs.count()
    val nlist = math.max(16, math.sqrt(n.toDouble).ceil.toInt)
    assert(out.length == nlist, s"audit must emit every centroid row (got ${out.length})")
    assert(out.map(_._2).sum == n, "per-cluster populations must partition the corpus")
    // empty clusters carry null stats; populated ones satisfy min <= mean
    out.foreach { case (c, nv, mean, mn) =>
      if (nv == 0) assert(mean.isEmpty && mn.isEmpty, s"cluster $c: empty but has stats")
      else {
        assert(mean.nonEmpty && mn.nonEmpty, s"cluster $c: populated but missing stats")
        assert(mn.get <= mean.get, s"cluster $c: min residual above mean")
      }
    }
    // brute: recompute the per-cluster micro stats from the assignment
    val vecs = embs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cluster = Similarity.assignClusters(embs, nlist)
      .select("vec_id", "c_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      val c = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = (0L until nlist.toLong).map { c =>
      val members = cluster.collect { case (v, cc) if cc == c => v }.toSeq
      if (members.isEmpty) (c, 0L, None, None)
      else {
        val ms = members.map(v => cosMicro(vecs(c), vecs(v)))
        val mean = BigDecimal(ms.sum.toDouble / ms.size)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (c, members.size.toLong, Some(mean), Some(ms.min))
      }
    }
    assert(out.toSeq == expected,
      s"health audit diverged from brute recompute:\n got=${out.toSeq}\n exp=$expected")
  }

  test("filtered vector search: exact top-k over only the matching-metadata set") {
    val d = sf("sf0.001")
    val out = graft.SparkEntry.queries("sim_topk_filtered")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val en = graft.queries.Registry.table(spark, d, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => en.contains(r._3)),
      "a neighbor outside the metadata filter leaked into the result")
    val vecs = embs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val r = a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (0L until 8L).flatMap { q =>
      en.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5).zipWithIndex
        .map { case ((v, c), i) => (q, i + 1, v, c) }
    }
    assert(out.toSeq == expected,
      s"filtered top-k diverged from brute recompute:\n got=${out.toSeq}\n exp=$expected")
    // pre-filter semantics: k is FILLED from the filtered set (not a
    // post-filtered under-full list) — the fixture has ≫5 en docs
    assert(en.size > 6, "fixture degenerated: too few matching docs to fill k")
    assert(out.groupBy(_._1).forall(_._2.length == 5))
  }

  test("k-means iteration via VectorMean Aggregator: SSE non-increasing") {
    import org.apache.spark.sql.functions.avg
    def sse(centroids: org.apache.spark.sql.DataFrame): Double =
      Similarity.assignClustersL2(embs, centroids)
        .agg(avg(col("c_dist") * col("c_dist"))).collect().head.getDouble(0)
    val c0 = Similarity.seedCentroids(embs, 16)
    val sse0 = sse(c0)
    val c1 = Similarity.kmeansIter(embs, c0)
    val sse1 = sse(c1)
    val c2 = Similarity.kmeansIter(embs, c1)
    val sse2 = sse(c2)
    info(f"SSE: seed=$sse0%.4f iter1=$sse1%.4f iter2=$sse2%.4f")
    assert(sse1 <= sse0 + 1e-9 && sse2 <= sse1 + 1e-9)
    assert(c1.count() <= 16 && c1.head().getSeq[Double](1).size == 64)
  }

  test("rolling hash: deterministic, whitespace/punct-insensitive via normalization") {
    import spark.implicits._
    val out = Seq("Hello,  World!", "hello world", "different text")
      .toDF("text").select(TextStats.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out.forall(h => h >= 0 && h < 1000000007L))
  }

  test("repetition stats: known-answer fractions on constructed docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa aaa aaa aaa"), // 4 tokens 1 distinct; 2 3-grams 1 distinct
      (2L, "a b c"),           // all distinct; single 3-gram
      (3L, "x y")              // too short for a 3-gram → 0.0
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (0.75, 0.5))
    assert(out(2L) == (0.0, 0.0))
    assert(out(3L) == (0.0, 0.0))
  }

  test("contamination: planted copies of benchmark docs flagged; flag consistent with overlap") {
    // NB: the synthetic corpus reuses sentences ACROSS documents (up to
    // ~90 shared 7-grams between unrelated docs), so "unrelated docs stay
    // clean" does not hold here — organic overlap is real signal the
    // operator is supposed to report. The guarantees pinned instead:
    val bench = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val crawl = Dedup.planted(docs).filter(col("doc_id") >= 1000000L)
    val out = Dedup.benchmarkContamination(crawl, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // exact copies (id = 1e6 + src, src % 20 == 0) duplicate a benchmark
    // doc verbatim → every one must be flagged
    val exactCopies = out.keys.filter(_ < 2000000L)
    assert(exactCopies.nonEmpty && exactCopies.forall(out(_)._2),
      "an exact copy of a benchmark doc escaped the contamination check")
    // near-copies OF benchmark docs (src % 100 == 0) differ by one token →
    // still flagged, and never MORE overlapped than the verbatim copy
    // (their REPLACED-prefixed shingles cannot exist in the benchmark)
    val nearOfBench = out.keys.filter(id => id >= 2000000L && (id - 2000000L) % 100 == 0)
    assert(nearOfBench.nonEmpty && nearOfBench.forall(out(_)._2),
      "a one-token mutation of a benchmark doc escaped the check")
    nearOfBench.foreach { id =>
      val src = id - 2000000L
      assert(out(id)._1 <= out(1000000L + src)._1,
        s"near-copy $id overlaps more than the verbatim copy of the same source")
    }
    // the flag is exactly the minOverlap threshold applied to n_overlap
    assert(out.values.forall { case (n, flag) => flag == (n >= 5L) })
  }

  test("join_asof_nearest: forward beats farther backward, tie goes backward, tolerance excludes, no-view user is NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_asofnfix").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime
    def ts(offSec: Long) = new java.sql.Timestamp(t0 + offSec * 1000)
    val rows = Seq(
      // user 1: purchase at t=0; views at -100 s and +40 s → forward wins
      (10L, ts(-100), 1L, "view", 0.0, "{}"),
      (11L, ts(0), 1L, "purchase", 1.0, "{}"),
      (12L, ts(40), 1L, "view", 0.0, "{}"),
      // user 2: views at ±60 s exactly → tie goes to the backward side
      (20L, ts(-60), 2L, "view", 0.0, "{}"),
      (21L, ts(0), 2L, "purchase", 1.0, "{}"),
      (22L, ts(60), 2L, "view", 0.0, "{}"),
      // user 3: nearest view is 400 s away — outside ±300 s → NULL
      (30L, ts(-400), 3L, "view", 0.0, "{}"),
      (31L, ts(0), 3L, "purchase", 1.0, "{}"),
      // user 4: no views at all → NULL
      (41L, ts(0), 4L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.get(r.fieldIndex("view_id"))),
          Option(r.get(r.fieldIndex("delta_us")))))
      .toMap
    assert(out(11L) == ((Some(12L), Some(40000000L))), out.toString)
    assert(out(21L) == ((Some(20L), Some(-60000000L))), out.toString)
    assert(out(31L) == ((None, None)) && out(41L) == ((None, None)))
  }

  test("multimodal_phash: re-encode artifact caught at small Hamming, md5 screen provably misses it, unrelated payloads not paired") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phashfix").toString
    // Text stands in for payload bytes (the mediaTable contract). The
    // fixture corpus: one base doc, plus the %10 recrawl mechanism inside
    // the query itself perturbs doc 0's first byte ("X" || rest).
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val other = "completely different bytes with other content here " * 5
    Seq((0L, base), (1L, other), (7L, base + "tail"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("multimodal_phash")(spark, dir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    // recrawl of doc 0 gets id 0 + max(7) + 1 = 8; one byte changed ⇒
    // Hamming ≤ 1 (0 when the byte parity happens to match).
    val hit = out.find(p => p._1 == 0L && p._2 == 8L)
    assert(hit.isDefined, s"perturbed recrawl not caught: ${out.toSeq}")
    assert(hit.get._3 <= 1)
    // md5 cannot pair them: the payload bytes differ ('X' != 't').
    assert(!out.exists(p => p._1 == 1L || p._2 == 1L),
      s"unrelated payload paired: ${out.toSeq}")
  }

  test("text_collocations: exclusive pair outranks a frequent-but-promiscuous one; exact tie broken by s") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_collofix").toString
    // 5×"aa bb" (exclusive parts) vs 10×"cc dd" whose parts also appear in
    // 10×"cc ee" and 10×"ff dd". N = 35 bigrams:
    //   ratio(aa bb) = 35·5/(5·5)   = 7     → pmi = ln 7    ≈  1.945910
    //   ratio(cc ee) = 35·10/(20·10)= 1.75  → pmi = ln 1.75 ≈  0.559616
    //   ratio(ff dd) =                1.75  (exact tie → s order)
    //   ratio(cc dd) = 35·10/(20·20)= 0.875 → pmi           ≈ -0.133531
    val texts = Seq.fill(5)("aa bb") ++ Seq.fill(10)("cc dd") ++
      Seq.fill(10)("cc ee") ++ Seq.fill(10)("ff dd")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_collocations")(spark, dir)
      .collect().map(r => (r.getAs[String]("s"), r.getAs[Long]("n_ab"),
        r.getAs[Double]("pmi")))
    assert(out.map(_._1).toSeq ==
      Seq("aa bb", "cc ee", "ff dd", "cc dd"), out.toSeq.toString)
    assert(out(0)._3 == 1.94591 && out(1)._3 == 0.559616 &&
      out(2)._3 == 0.559616 && out(3)._3 == -0.133531)
    assert(out(0)._2 == 5L && out(3)._2 == 10L)
  }

  test("text_gopher_rules: each rule trips on its designed violator and only there") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gopherfix").toString
    // 60 normal words incl. several Gopher stops — passes everything.
    val good = ("the cat sat on the mat with a dog and that bird have " +
      "seen many things of note here today ").trim
    val goodDoc = (good + " ") * 3 // 66 words, mean len ~3.2
    // 10 words only → r_wordcount fails (everything else passes or is moot).
    val short = "the cat and the dog have fun with that mat"
    // 60 long tokens → r_meanlen fails (len 16 > 10); no stops → r_stop fails.
    val longTok = Seq.fill(60)("abcdefghijklmnop").mkString(" ")
    // 10 lines, all bullet-started → r_bullet fails (10·10 > 9·10).
    val bullets = Seq.fill(10)("- item of the list and that thing have with").mkString("\n")
    // every line ends in ... → r_ellipsis fails; many ... → r_symbol fails.
    val ellip = Seq.fill(10)("the story of and that have with trails off...").mkString("\n")
    // 60 numeric tokens + 2 stops → r_alpha fails (alpha frac ≈ 0.03).
    val nums = (Seq.fill(60)("12345") ++ Seq("the", "of")).mkString(" ")
    Seq((0L, goodDoc), (1L, short), (2L, longTok), (3L, bullets),
      (4L, ellip), (5L, nums))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_gopher_rules")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("r_wordcount"), r.getAs[Int]("r_meanlen"),
          r.getAs[Int]("r_symbol"), r.getAs[Int]("r_bullet"),
          r.getAs[Int]("r_ellipsis"), r.getAs[Int]("r_alpha"),
          r.getAs[Int]("r_stop"), r.getAs[Int]("gopher_pass"))).toMap
    assert(out(0L) == ((1, 1, 1, 1, 1, 1, 1, 1)), out(0L).toString)
    assert(out(1L)._1 == 0 && out(1L)._8 == 0)
    assert(out(2L)._2 == 0 && out(2L)._7 == 0)
    assert(out(3L)._4 == 0 && out(3L)._5 == 1)
    assert(out(4L)._5 == 0 && out(4L)._3 == 0)
    assert(out(5L)._6 == 0 && out(5L)._7 == 1)
  }

  test("text_ngram_novelty: copy scores 0, half-new doc scores 0.5, first doc scores 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_novelfix").toString
    val base = "a b c d e f g h i" // 9 tokens → two 8-grams
    Seq((0L, base), (1L, base), (2L, "a b c d e f g h z"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_ngram_novelty")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(out(0L) == ((2L, 2L, 1.0)), out.toString)
    assert(out(1L) == ((2L, 0L, 0.0)), out.toString)
    assert(out(2L) == ((2L, 1L, 0.5)), out.toString)
  }

  test("corpus_diversity: hand fixture — exact Simpson/eff fixed point, Shannon to 6dp, overall row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_divfix").toString
    // en: s1×3, s2×1 → simpson6 = 10e6/16 = 625000, eff6 = 16e6/10 =
    // 1600000, H = ln4 − 3ln3/4 = 0.562335. de: s1×2 → λ = 1, H = 0.
    // overall: s1×5, s2×1 → simpson6 = 26e6/36 = 722222, eff6 = 1384615,
    // H = ln6 − 5ln5/6 = 0.450561.
    val rows = (0 until 3).map(i => (i.toLong, "t", "en", "s1")) ++
      Seq((3L, "t", "en", "s2"), (4L, "t", "de", "s1"), (5L, "t", "de", "s1"))
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("corpus_diversity")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("k_sources"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("simpson6"), r.getAs[Long]("eff6"),
          r.getAs[Double]("shannon"))).toMap
    assert(out("en") == ((2L, 4L, 625000L, 1600000L, 0.562335)), out.toString)
    assert(out("de") == ((1L, 2L, 1000000L, 1000000L, 0.0)), out.toString)
    assert(out("*") == ((2L, 6L, 722222L, 1384615L, 0.450561)), out.toString)
  }

  test("embed_dim_audit: hand fixture — exact moments per dim, dead dim flagged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dimfix").toString
    // dim 0: {1.0, 3.0} → mean 2, var 1; dim 1: all zero → dead.
    Seq((0L, Seq(1.0f, 0.0f), 0), (1L, Seq(3.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("embed_dim_audit")(spark, dir)
      .collect().map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n_vals"), r.getAs[Long]("n_zero"),
          r.getAs[Long]("min6"), r.getAs[Long]("max6"),
          r.getAs[Double]("mean"), r.getAs[Double]("variance"),
          r.getAs[Int]("dead"))).toMap
    assert(out(0) == ((2L, 0L, 1000000L, 3000000L, 2.0, 1.0, 0)), out.toString)
    assert(out(1) == ((2L, 2L, 0L, 0L, 0.0, 0.0, 1)), out.toString)
  }

  test("corpus_overlap: identical sources contain each other fully, partial overlap scores 0.5, disjoint source absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_overlapfix").toString
    val base = "a b c d e f g h i" // grams g1, g2
    Seq((0L, base, "s1"), (1L, base, "s2"),
      (2L, "q r s t u v w x y", "s3"),
      (3L, "a b c d e f g h z", "s4")) // shares g1 with s1/s2
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("corpus_overlap")(spark, dir)
      .collect().map(r => ((r.getAs[String]("src_a"), r.getAs[String]("src_b")),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))))
    assert(out.map(_._1).toSeq == Seq(("s1", "s2"), ("s1", "s4"), ("s2", "s4")),
      out.toSeq.toString)
    val m = out.toMap
    assert(m(("s1", "s2")) == ((2L, 2L, 2L, 1.0)))
    assert(m(("s1", "s4")) == ((2L, 2L, 1L, 0.5)))
    assert(m(("s2", "s4")) == ((2L, 2L, 1L, 0.5)))
  }

  test("text_langid_eval: correct docs land on the diagonal, a mislabeled doc shows as off-diagonal mass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_langevalfix").toString
    // two true-en docs predicted en; one doc LABELED de but written in
    // English → row (de, en); one marker-free doc → (en, und).
    Seq((0L, "the cat and the dog of it", "en"),
      (1L, "it is the best of the lot", "en"),
      (2L, "the quick brown fox and the hen", "de"),
      (3L, "zzz qqq xxx", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_langid_eval")(spark, dir)
      .collect().map(r => ((r.getAs[String]("lang"), r.getAs[String]("pred_lang")),
        (r.getAs[Long]("n"), r.getAs[Long]("n_lang"), r.getAs[Double]("row_frac"))))
      .toMap
    assert(out(("en", "en")) == ((2L, 3L, 0.666667)), out.toString)
    assert(out(("en", "und")) == ((1L, 3L, 0.333333)), out.toString)
    assert(out(("de", "en")) == ((1L, 1L, 1.0)), out.toString)
    assert(out.size == 3, out.toString)
  }

  test("text_chunk: boundary math — 128-token windows, remainder in the last chunk") {
    val out = graft.SparkEntry.queries("text_chunk")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    val tokCounts = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(Dedup.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    byDoc.foreach { case (docId, chunks) =>
      val n = tokCounts(docId)
      val expectChunks = ((n + 127) / 128).max(1)
      assert(chunks.length == expectChunks, s"doc $docId: ${chunks.length} chunks for $n tokens")
      // chunk ids are dense 0..k-1; all full except a possible remainder tail
      assert(chunks.map(_._2).sorted.sameElements(0L until expectChunks))
      val sizes = chunks.sortBy(_._2).map(_._3)
      assert(sizes.init.forall(_ == 128L) || expectChunks == 1)
      assert(sizes.last == (if (n % 128 == 0) 128L else n % 128))
      assert(sizes.sum == n, s"doc $docId: chunk sizes must partition the token stream")
    }
  }

  test("mixture sampling: achieved per-language rates track the targets") {
    val sampled = graft.SparkEntry.queries("corpus_mix_sample")(spark, sf("sf0.01"))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = table(spark, sf("sf0.01"), "documents")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 1.0, "zh" -> 0.5, "es" -> 0.5, "de" -> 0.25, "fr" -> 0.1)
    targets.foreach { case (lang, want) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      // nonzero first: a dropped rate branch would zero a whole language
      // bucket yet still sit inside a loose absolute tolerance
      assert(got > 0.0, s"$lang vanished from the mixture entirely")
      if (lang == "en") assert(got == 1.0, "rate 1.0 must keep every doc")
      else assert(math.abs(got - want) < 0.2, s"$lang rate $got vs target $want")
    }
  }

  test("transitions: edge counts conserve events (n_events - n_users)") {
    val ev = graft.queries.Registry.events(spark, sf("sf0.001"))
    val edges = graft.queries.ExtQueries.all("events_transitions")
      .fn(spark, sf("sf0.001")).collect()
    val total = edges.map(_.getLong(2)).sum
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(total == nEvents - nUsers,
      s"every user contributes len-1 transitions: $total != $nEvents - $nUsers")
    assert(edges.map(r => (r.getString(0), r.getString(1))).distinct.length == edges.length)
  }

  test("lm score: frequent-token docs score lower than rare-token docs on average") {
    val rows = graft.queries.ExtQueries.all("text_lm_score")
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nll) =>
      assert(n > 0 && nll > 0, s"doc $id: degenerate LM score ($n tokens, nll $nll)")
    }
    // avg NLL is bounded by the rarest single token's NLL (≤ log2(total))
    val totalTokens = rows.map(_._2).sum.toDouble
    val bound = math.log(totalTokens) / math.log(2)
    rows.foreach { case (id, _, nll) =>
      assert(nll <= bound + 1e-9, s"doc $id: nll $nll above log2(corpus total)")
    }
  }

  test("compaction: survivors = corpus minus non-representative cluster members") {
    val docs2 = docs
    val survivors = graft.queries.ExtQueries.all("dedup_compact")
      .fn(spark, sf("sf0.001")).collect().map(_.getLong(0)).toSet
    val pairs = Dedup.simhashPairs(docs2).select("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val removed = clusters.collect { case (d, c) if d != c => d }.toSet
    val all = Dedup.planted(docs2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- removed)
    // every cluster keeps exactly its representative
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(survivors.contains(cid), s"cluster $cid lost its representative")
      members.map(_._1).filter(_ != cid).foreach(m =>
        assert(!survivors.contains(m), s"non-representative $m survived"))
    }
  }

  test("quality classifier: sane sigmoid scores, keep gate consistent with score") {
    val rows = graft.queries.ExtQueries.all("quality_classifier")
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, wSum, score, keep) =>
      assert(score > 0 && score < 1, s"doc $id: sigmoid out of range: $score")
      assert(keep == (score >= 0.5), s"doc $id: keep flag inconsistent")
      // weights are bounded by ±0.5 per token, so the sum is too
      assert(math.abs(wSum) <= nTok * 500000L, s"doc $id: weight sum out of bounds")
    }
    // a hash-derived model must not degenerate to one side of the gate
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "scores should straddle the 0.5 gate on a hash-weighted vocabulary")
  }

  test("char entropy: bounded by log2 of the alphabet, positive on real text") {
    val rows = graft.queries.ExtQueries.all("text_entropy")
      .fn(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nChars, nDistinct, h) =>
      assert(h > 0, s"doc $id: entropy $h should be positive on mixed text")
      // uniform distribution over n_distinct symbols maximizes entropy
      assert(h <= math.log(nDistinct.toDouble) / math.log(2) + 1e-9,
        s"doc $id: entropy $h above log2($nDistinct)")
      assert(nChars > 0)
    }
  }

  test("pq ANN: valid codes, well-formed top-k, bounded by brute-force scores") {
    val codebook = Similarity.pqCodebook(embs)
    assert(codebook.count() == 8L * 16)
    val codes = Similarity.pqCodes(embs, codebook).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(codes.forall { case (_, _, c) => c >= 0 && c < 16 })
    // a codebook seed vector reconstructs exactly, so its own-subspace fit
    // is minimal: every seed vector must code to itself in every subspace
    codes.filter(_._1 < 16).foreach { case (v, s, c) =>
      assert(c == v, s"seed vector $v coded to $c in subspace $s")
    }
    val pq = Similarity.pqTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(pq.map(_._1).distinct.length == 8)
    assert(pq.groupBy(_._1).forall(_._2.length == 5))
    val brute = Similarity.bruteTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val bruteBest = brute.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    assert(pq.forall { case (q, _, c) => c <= bruteBest(q) + 1e-9 })
    val bruteSet = brute.map(p => (p._1, p._2)).toSet
    val recall = pq.count(p => bruteSet.contains((p._1, p._2))).toDouble / brute.length
    info(f"PQ recall@5 vs brute: $recall%.2f (m=8, ksub=16, overfetch=4, random data)")
    assert(recall > 0.0)
  }

  test("ivfpq ANN: well-formed top-k, bounded by brute scores, candidates within probed buckets") {
    val ivfpq = Similarity.ivfpqTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ivfpq.map(_._1).distinct.length == 8)
    assert(ivfpq.groupBy(_._1).forall(_._2.length == 5))
    val brute = Similarity.bruteTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val bruteBest = brute.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).max }
    assert(ivfpq.forall { case (q, _, c) => c <= bruteBest(q) + 1e-9 })
    val bruteSet = brute.map(p => (p._1, p._2)).toSet
    val recall = ivfpq.count(p => bruteSet.contains((p._1, p._2))).toDouble / brute.length
    info(f"IVF-PQ recall@5 vs brute: $recall%.2f (nlist=16, nprobe=4, m=8, random data)")
    assert(recall > 0.0)
    // every candidate must come from a probed bucket — the probe filter is
    // the whole point of the coarse quantizer
    val cand = Similarity.ivfpqCandidates(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val assigned = Similarity.assignClusters(embs, 16)
      .select("vec_id", "c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probedPairs = cand.map { case (q, v) => (q, assigned(v)) }.toSet
    assert(probedPairs.size <= 8 * 4,
      s"candidates span ${probedPairs.size} (query, bucket) pairs — more than nQueries x nprobe")
  }

  test("connected components: chains merge, disjoint clusters stay apart") {
    import spark.implicits._
    // {1,2,3,10} via a chain + a long bridge, {7,8} separate: propagation
    // must run past one round to label 10 with the component min
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 3L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L),
      (10L, 1L, 4L), (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("connected components: planted exact copies land in their original's cluster") {
    val pairs = Dedup.simhashPairs(docs).select("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactPairs = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => b == a + 1000000 }
    assert(exactPairs.nonEmpty)
    exactPairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"$a and its copy $b split across clusters")
    }
    // every cluster id is the min of its members (the canonical keep id)
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid is not its member min")
    }
  }

  test("line dedup: exact-copy docs keep nothing, originals keep something") {
    val rows = Dedup.lineDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val copies = rows.filter(r => r._1 >= 1000000L && r._1 < 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, _, kept) =>
      assert(kept == 0, s"exact copy $id kept $kept chunks; its original precedes it")
    }
    assert(rows.forall { case (_, n, kept) => kept >= 0 && kept <= n })
    // at least the first-seen doc of every duplicated chunk keeps it: the
    // corpus can't dedup to nothing
    assert(rows.filter(_._1 < 1000000L).map(_._3).sum > 0)
  }

  test("quantization: reconstruction error bounded by scale/2") {
    val q = graft.queries.ExtQueries.all("embed_quantize")
      .fn(spark, sf("sf0.001")).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val scale = r.getDouble(2); val maxErr = r.getDouble(4)
      assert(scale > 0, s"vec ${r.getLong(0)}: degenerate scale")
      // round(x/s) reconstruction error is <= s/2; 1e-6 covers the 6dp
      // rounding of both reported columns
      assert(maxErr <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: err $maxErr exceeds scale/2 = ${scale / 2}")
    }
  }

  test("multimodal: batched decode plumbing produces stable features") {
    import spark.implicits._
    val media = Multimodal.mediaTable(docs).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.sameElements(again), "decode must be deterministic")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.forall(f => f.n_bytes == texts(f.doc_id).getBytes("UTF-8").length))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.map(_.media_type).toSet == Set("image/png", "audio/wav", "video/mp4"))
  }

  test("multimodal: frame sampling is video-only, stride-capped at 8, deterministic") {
    import spark.implicits._
    val media = Multimodal.mediaTable(docs).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(media).collect()
    val again = Multimodal.sampleFrames(media).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx))
      .sameElements(again.sortBy(f => (f.doc_id, f.frame_idx))))
    // only video docs produce frames
    val videoIds = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 3 == 2).toSet
    assert(frames.map(_.doc_id).toSet == videoIds)
    val perDoc = frames.groupBy(_.doc_id)
    perDoc.foreach { case (id, fs) =>
      assert(fs.length <= 8, s"doc $id sampled ${fs.length} frames (> 8)")
      assert(fs.forall(f => f.frame_ms == f.frame_idx * 40))
      // indices are a 0-based arithmetic stride
      val idx = fs.map(_.frame_idx).sorted
      assert(idx.head == 0)
      if (idx.length > 1) {
        val d = idx(1) - idx(0)
        assert(idx.zipWithIndex.forall { case (v, k) => v == k * d })
      }
    }
    // hand-checked stride: 1000-byte payload → 15 frames, stride 2 → 8 sampled
    val one = Seq(Multimodal.MediaRow(2L, "video/mp4", Array.fill(1000)(7.toByte)))
      .toDS()
    val fs = Multimodal.sampleFrames(one).collect().map(_.frame_idx).sorted
    assert(fs.toSeq == Seq(0, 2, 4, 6, 8, 10, 12, 14))
  }

  test("global index: contiguous 0..n-1, order-aligned, input-partitioning-invariant") {
    val base = docs.select("doc_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Indexing.globalIndex(df, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val idx = run(base)
    val n = base.count()
    assert(idx.length == n)
    assert(idx.map(_._2) == idx.map(_._2).sorted, "index not ascending with doc_id")
    assert(idx.map(_._2).toSet == (0L until n).toSet, "index not contiguous 0..n-1")
    assert(run(base.repartition(17)) == idx, "index depends on input partitioning")
  }

  test("range search: complete within tau, nothing below, zero vectors and self excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rangefix").toString
    // q0 = [1,0]: cos 1.0 (id 2), ~0.707 (id 3), 0.0 (id 4), -1.0 (id 5);
    // id 6 is the zero vector (NaN cosine — must NOT pass the τ filter
    // even though both engines order NaN above every double)
    Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(2f, 0f), 0), (3L, Array(1f, 1f), 0),
      (4L, Array(0f, 3f), 0), (5L, Array(-1f, 0f), 0),
      (6L, Array(0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("sim_range_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._3 >= 0.3), s"below-τ neighbor leaked: ${out.toSeq}")
    assert(out.forall(r => r._1 != r._2), "self pair leaked")
    assert(!out.exists(_._2 == 6L), "zero vector (NaN cosine) leaked past τ")
    // completeness for q0: exactly {2 (cos 1), 3 (cos .707107)} — a top-1
    // would truncate this neighborhood; range search must not
    assert(out.filter(_._1 == 0L).map(r => r._2 -> r._3).toSeq
      == Seq(2L -> 1.0, 3L -> 0.707107), s"q0 neighborhood: ${out.toSeq}")
    // q4 ([0,3]) ∥ q1 ([0,1]): the parallel pair appears from BOTH ends
    assert(out.contains((4L, 1L, 1.0)) && out.contains((1L, 4L, 1.0)))
  }

  test("range search via IVF screen: subset of exact with matching scores, non-trivial at sf0.001") {
    val d = sf("sf0.001")
    def pairs(name: String) = graft.SparkEntry.queries(name)(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs("sim_range_search")
    val screened = pairs("sim_range_ivf")
    assert(screened.keySet.subsetOf(exact.keySet),
      s"screen fabricated pairs: ${screened.keySet -- exact.keySet}")
    screened.foreach { case (k, c) =>
      assert(exact(k) == c, s"score mismatch at $k: screened $c vs exact ${exact(k)}")
    }
    assert(screened.nonEmpty, "screen found nothing — fixture too sparse to exercise recall")
  }
}
