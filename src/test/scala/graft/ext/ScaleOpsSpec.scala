package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Pins the scale-infrastructure operators (ScaleQueries): Z-order
  * interleave + clustering benefit, bloom-prune completeness + pruning
  * power + plan shape, fixed-point PageRank determinism, SCD2 interval
  * algebra, and BM25 monotonicity. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ z-order
  test("zorder: spread16/zvalue16 match the bitwise reference") {
    def refSpread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, 123456L)
    val rows = vals.toDF("v")
      .select(col("v"), ZOrder.spread16(col("v")).as("s"),
        ZOrder.zvalue16(col("v"), col("v") + 1).as("z"))
      .collect()
    rows.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) === refSpread(v), s"spread16($v)")
      assert(r.getLong(2) === (refSpread(v) | (refSpread(v + 1) << 1)), s"zvalue16($v)")
    }
  }

  test("zorder: quadrant buckets bound BOTH dimensions' spans") {
    // 256 points on a 16x16 grid scaled to 16 bits: the top 6 z-bits are
    // (x top 3, y top 3) → an 8x8 quadrant grid where each bucket covers
    // at most 1/8 of each dimension's range — the property min-max file
    // skipping prunes on.
    val pts = for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong * 4369, y.toLong * 4369) // 4369 = 65535/15
    val spans = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue16(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), 26).as("bucket"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length === 64, "top 6 z-bits over 2 filled dims = 8x8 quadrants")
    spans.foreach { r =>
      assert(r.getLong(1) <= 65535 / 8 && r.getLong(2) <= 65535 / 8,
        s"quadrant span too wide: $r")
      assert(r.getLong(3) === 4L, "equal occupancy on the uniform grid")
    }
  }

  test("zorder: layout() range-partitions into disjoint tight z-ranges") {
    val li = table(spark, sf("sf0.001"), "lineitem")
    val laid = ZOrder.layout(li, "l_partkey", "l_suppkey", numFiles = 8)
    // per-output-partition spans of the clustering dims shrink vs global
    val spans = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("l_partkey") - min("l_partkey")).as("span"))
      .agg(avg("span")).as[Double].head()
    val global = li.agg(max("l_partkey") - min("l_partkey")).as[Long].head()
    assert(spans < global, s"z-layout should tighten partkey spans: $spans vs $global")
  }

  test("deltaJoinView: 4-quadrant union equals the full join, every quadrant contributes") {
    import graft.ext.Upsert
    val d = sf("sf0.001")
    val orders = table(spark, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = table(spark, d, "customer").select("c_custkey")
    val cut = to_date(lit("1997-06-01"))
    val aOld = orders.filter(col("o_orderdate") < cut)
    val dA = orders.filter(col("o_orderdate") >= cut)
    val bOld = cust.filter(col("c_custkey") % 97 =!= 0)
    val dB = cust.filter(col("c_custkey") % 97 === 0)
    val cond = col("o_custkey") === col("c_custkey")
    def keys(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("o_orderkey", "c_custkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val vOld = aOld.join(bOld, cond)
    val maintained = Upsert.deltaJoinView(vOld, aOld, dA, bOld, dB, cond)
    assert(keys(maintained) == keys(orders.join(cust, cond)),
      "delta-maintained view must equal the full-join recompute row-for-row")
    // the identity is only exercised if every quadrant is non-empty here
    for ((nm, q) <- Seq("vOld" -> vOld, "dA><bOld" -> dA.join(bOld, cond),
        "aOld><dB" -> aOld.join(dB, cond), "dA><dB" -> dA.join(dB, cond)))
      assert(q.limit(1).count() == 1L, s"quadrant $nm is empty — fixture degenerate")
  }

  // -------------------------------------------------------- bloom prune
  test("bloom prune: zero false negatives, real pruning, plan-visible filter") {
    val cust = table(spark, sf("sf0.001"), "customer")
    val orders = table(spark, sf("sf0.001"), "orders")
    val dim = cust.filter(col("c_mktsegment") === "BUILDING")

    val pruned = BloomPrune.semiJoinPruned(orders, "o_custkey", dim, "c_custkey",
      expectedKeys = 1L << 16, fpp = 0.01)
    val exact = orders.join(dim.select("c_custkey").distinct(),
      col("o_custkey") === col("c_custkey"), "left_semi")
    assert(pruned.count() === exact.count(), "bloom+semi must equal plain semi")

    // the sketch alone keeps a superset of the true rows but prunes most
    // of the complement (fpp 1% → expect well under 10% of non-matching)
    val bloomOnly = orders.filter(
      BloomPrune.mightContain(dim, "c_custkey", 1L << 16, 0.01, col("o_custkey")))
    val nBloom = bloomOnly.count()
    val nExact = exact.count()
    val nAll = orders.count()
    assert(nBloom >= nExact, "no false negatives allowed")
    assert(nBloom - nExact <= (nAll - nExact) / 10,
      s"bloom should prune non-matching rows: kept $nBloom of $nAll for $nExact true")

    // pruning is plan-visible: a might_contain filter below the join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom filter missing from plan:\n$plan")
  }

  test("bloom prune: lazy subquery form == eager literal form, builds no construction job") {
    val cust = table(spark, sf("sf0.001"), "customer")
    val orders = table(spark, sf("sf0.001"), "orders")
    val dim = cust.filter(col("c_mktsegment") === "BUILDING")

    val sc = spark.sparkContext
    sc.setJobGroup("bloom-lazy", "guard")
    try {
      val lazyPred = BloomPrune.mightContainSubquery(
        dim, "c_custkey", 1L << 16, 0.01, col("o_custkey"))
      val lazyDf = orders.filter(lazyPred) // plan construction only
      Thread.sleep(1000)
      assert(sc.statusTracker.getJobIdsForGroup("bloom-lazy").isEmpty,
        "subquery-form bloom must not run jobs at plan-construction time")
      // semantics: the two forms hash differently (putLong vs XxHash64
      // pre-hash) so their FALSE POSITIVE sets may differ — but both must
      // keep every true key and prune comparably at the same fpp
      val eager = orders.filter(BloomPrune.mightContain(
        dim, "c_custkey", 1L << 16, 0.01, col("o_custkey")))
      val exact = orders.join(dim.select("c_custkey").distinct(),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      val a = lazyDf.select("o_orderkey").collect().map(_.getLong(0)).toSet
      val b = eager.select("o_orderkey").collect().map(_.getLong(0)).toSet
      val nAll = orders.count()
      assert(exact.subsetOf(a) && exact.subsetOf(b), "false negative in a bloom form")
      assert((a.size - exact.size) <= (nAll - exact.size) / 10, s"lazy form barely prunes: ${a.size}")
      assert((b.size - exact.size) <= (nAll - exact.size) / 10, s"eager form barely prunes: ${b.size}")
    } finally sc.clearJobGroup()
  }

  // ----------------------------------------------------------- pagerank
  test("pagerank: bit-identical across partitionings, sane fixed-point values") {
    val li = table(spark, sf("sf0.001"), "lineitem").select("l_orderkey", "l_partkey")
    val edges = Graph.withOutDegree(Graph.copurchaseEdges(li))
    def run(parts: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Graph.pagerankFixedPoint(edges, 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val a = run("4")
    val b = run("7")
    assert(a === b, "integer fixed-point must be partition-invariant")
    assert(a.nonEmpty && a.values.forall(_ >= 150000L),
      "every node keeps at least the teleport mass")
    // total mass is conserved up to truncation loss: each edge drops <1
    // unit, so sum(pr) ∈ (0.15|V| + 0.85*sum_prev - |E|, 0.15|V| + 0.85*sum_prev]
    val v = a.size.toLong
    assert(a.values.sum <= 150000L * v + 850000L * v && a.values.sum > 900000L * v,
      s"mass conservation violated: sum=${a.values.sum}, |V|=$v")
  }

  test("ppr: teleport mass stays in the seed component; unreachable nodes score 0") {
    // two components: a 3-cycle {1,2,3} (seeded at 1) and a 2-cycle
    // {10,11} (unseeded). PPR must concentrate all mass in the seed
    // component and give the other component EXACTLY zero — the property
    // separating personalized from global PageRank (which teleports
    // everywhere).
    val sym = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L),
      (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val edges = Graph.withOutDegree(sym)
    val seeds = Seq(1L).toDF("node")
    val pr = Graph.pprFixedPoint(edges, seeds, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet === Set(1L, 2L, 3L, 10L, 11L))
    assert(pr(10L) === 0L && pr(11L) === 0L,
      s"unseeded component must hold zero mass: $pr")
    assert(pr(1L) > pr(2L) && pr(1L) > pr(3L),
      s"the seed keeps the teleport advantage: $pr")
    assert(pr(2L) === pr(3L), s"symmetric neighbours tie: $pr")
  }

  // ----------------------------------------------------------- dupspans
  test("dupspans: planted shared span is counted on every copy, unique docs score 0") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta"), // span at pos 1
      (2L, s"pre1 pre2 pre3 pre4 pre5 pre6 pre7 $span"),      // span at pos 8
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),                 // unique
      (4L, "short doc")                                        // < 8 tokens
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.dupSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1/2 share exactly ONE 8-gram (the planted span); every other
    // gram straddles the span boundary and differs between the docs
    assert(out(1L)._2 === 1L && out(1L)._3 === 1L, s"doc1: ${out(1L)}")
    assert(out(2L)._2 === 1L && out(2L)._3 === 1L, s"doc2: ${out(2L)}")
    assert(out(3L) === ((3L, 0L, 0L)), s"unique doc must score 0: ${out(3L)}")
    assert(!out.contains(4L), "sub-n docs emit no grams (mirrors the oracle)")
    // 15 tokens ⇒ 8 positions per planted doc
    assert(out(1L)._1 === 8L && out(2L)._1 === 8L)
  }

  test("dedup-spans rewrite: planted span excised exactly; unique and short docs untouched") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta"), // span at pos 1-8
      (2L, s"pre1 pre2 pre3 pre4 pre5 pre6 pre7 $span"),      // span at pos 8-15
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),                 // unique
      (4L, "short doc")                                        // < 8 tokens
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.dedupSpansRewrite(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1: the one duplicated gram starts at pos 1 → tokens 1..8 go
    assert(out(1L) === ((15L, 8L,
      fp("alpha beta gamma delta epsilon zeta eta"))), s"doc1: ${out(1L)}")
    // doc 2: start pos 8 → tokens 8..15 go
    assert(out(2L) === ((15L, 8L,
      fp("pre1 pre2 pre3 pre4 pre5 pre6 pre7"))), s"doc2: ${out(2L)}")
    // unique doc: rewrite is the identity
    assert(out(3L) === ((10L, 0L, fp("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))),
      s"doc3: ${out(3L)}")
    // sub-n doc: no grams, nothing removable, still emitted (every doc
    // must survive the rewrite pass)
    assert(out(4L) === ((2L, 0L, fp("short doc"))), s"doc4: ${out(4L)}")
  }

  test("dedup-spans rewrite: interval-merge form == per-token reference (overlap/adjacent/saturated)") {
    // the interval-merge gap construction must reproduce the per-token
    // "covered by any dup start" rule exactly, including the shapes that
    // stress the merge: overlapping intervals, exactly-adjacent
    // intervals, a fully-saturated doc (one merged interval, empty
    // rewrite), and an untouched unique doc
    val w = (1 to 8).map(i => s"w$i").mkString(" ")
    val v = (1 to 8).map(i => s"v$i").mkString(" ")
    val rows = Seq(
      (1L, s"$w x1 $v x2 x3"),          // two disjoint intervals, gaps between
      (2L, s"$w $v"),                   // adjacent coverage → one merged block
      (3L, s"a1 $w a2"),                // interior interval, gaps both sides
      (4L, w), (5L, w),                 // saturated: whole doc covered
      (6L, "q1 q2 q3 q4 q5 q6 q7 q8 q9"))  // unique: identity rewrite
    val out = graft.queries.CurationQueries
      .dedupSpansRewrite(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // independent per-token reference (the pre-optimization semantics)
    val toks = rows.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, t) =>
      t.sliding(8).filter(_.size == 8)
        .foreach(g => gramDocs(g.mkString(" ")) =
          gramDocs.getOrElse(g.mkString(" "), Set.empty) + id)
    }
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    toks.foreach { case (id, t) =>
      val starts = (if (t.size >= 8)
        (0 to t.size - 8).filter(p => gramDocs(t.slice(p, p + 8).mkString(" ")).size >= 2)
      else Seq.empty).toSet
      val kept = t.indices.filterNot(i => starts.exists(x => i >= x && i <= x + 7))
      val expect = (t.size.toLong, (t.size - kept.size).toLong,
        fp(kept.map(t).mkString(" ")))
      assert(out(id) == expect, s"doc $id: got ${out(id)} want $expect")
    }
    assert(out(4L)._2 == 8L && out(4L)._3 == fp(""),
      "saturated doc must be fully excised to the empty fingerprint")
    assert(out(6L)._2 == 0L, "unique doc must be untouched")
  }

  test("bpe apply: 2-merge hand fixture — chained merges compose, greedy left-to-right runs") {
    val merges = Seq("t" -> "h", "th" -> "e")
    val docs = Seq(
      (1L, "the then on"), // the→1 tok (t,h then th,e chain), then→2, on→2
      (2L, "ththth"),      // alternating run: every (t,h) pair merges in one pass
      (3L, "  the   then "), // whitespace noise normalizes away
      (4L, null.asInstanceOf[String]) // null text → empty encode, not a crash
    ).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.applyBpe(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val S = "\u0001"
    def enc(tokens: Seq[Seq[String]]): String = // words of symbol lists
      tokens.map(_.map(sym => S + sym + S).mkString("")).mkString(" ")
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc1: "the"→[the], "then"→[the,n], "on"→[o,n] — 5 tokens, 9 chars
    assert(out(1L) == ((5L, 9L,
      fp(enc(Seq(Seq("the"), Seq("the", "n"), Seq("o", "n")))))), s"doc1: ${out(1L)}")
    // doc2: t,h,t,h,t,h → th,th,th (all three pairs merge in ONE pass;
    // (th,e) never fires without an e) — 3 tokens, 6 chars
    assert(out(2L) == ((3L, 6L,
      fp(enc(Seq(Seq("th", "th", "th")))))), s"doc2: ${out(2L)}")
    // doc3 ≡ "the then" after normalization
    assert(out(3L) == ((3L, 7L,
      fp(enc(Seq(Seq("the"), Seq("the", "n")))))), s"doc3: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, fp(""))), s"doc4 (null text): ${out(4L)}")
  }

  test("bpe apply: randomized corpora match a sequential reference encoder exactly") {
    // reference: per word, one left-to-right greedy non-overlapping pass
    // per merge, merges in rank order — the semantics the replace chain
    // must reproduce for ANY composition of merges over ANY text
    def refEncode(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { w =>
        var syms = w.map(_.toString).toVector
        merges.foreach { case (a, b) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms
      }
    val S = "\u0001"
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(42)
    (1 to 12).foreach { round =>
      // merge table by composition: each merge draws from the symbols
      // producible so far, so chains like (a,b)→ab, (ab,c)→abc occur
      var pool = Vector("a", "b", "c")
      val merges = (1 to (1 + rnd.nextInt(5))).map { _ =>
        val x = pool(rnd.nextInt(pool.size)); val y = pool(rnd.nextInt(pool.size))
        pool :+= (x + y); (x, y)
      }
      val docs = (0 until 8).map { id =>
        val words = (1 to (1 + rnd.nextInt(6))).map(_ =>
          (1 to (1 + rnd.nextInt(9))).map(_ => pool(rnd.nextInt(3))).mkString)
        // noisy whitespace exercises the normalize step
        (id.toLong, words.mkString(if (rnd.nextBoolean()) " " else "   ") +
          (if (rnd.nextBoolean()) " " else ""))
      }
      val out = graft.queries.CurationQueries
        .applyBpe(docs.toDF("doc_id", "text"), merges).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      docs.foreach { case (id, text) =>
        val enc = refEncode(text, merges)
        val expectStr = enc.map(_.map(sym => S + sym + S).mkString("")).mkString(" ")
        val expect = (enc.map(_.size).sum.toLong,
          enc.flatten.map(_.length).sum.toLong, fp(expectStr))
        assert(out(id) == expect,
          s"round $round doc $id diverged for merges=$merges text='$text': " +
            s"got ${out(id)} want $expect (ref=$enc)")
      }
    }
  }

  test("dedup-spans indexed serving == inline recompute; replay-duplicated artifact harmless") {
    val docs = table(spark, sf("sf0.001"), "documents").select("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val inline = rows(graft.queries.CurationQueries.dedupSpansRewrite(docs))
    val root = java.nio.file.Files.createTempDirectory("graft_gramdf_spec")
    val p = root.resolve("grams").toString
    graft.queries.CurationQueries.dupGramTable(docs)
      .write.mode("overwrite").parquet(p)
    def served(path: String) = rows(graft.queries.CurationQueries.dedupSpansRewrite(
      docs, dupGrams = Some(spark.read.schema("gram STRING").parquet(path))))
    assert(served(p) == inline, "artifact-served rewrite diverged from inline")
    assert(inline.exists(_._3 > 0), "fixture degenerated: no spans removed")
    // a replay-duplicated artifact (rows appended twice) must not change
    // anything — membership is a left_semi, never a count
    val p2 = root.resolve("grams2").toString
    val g = spark.read.schema("gram STRING").parquet(p)
    g.unionByName(g).write.mode("overwrite").parquet(p2)
    assert(served(p2) == inline, "duplicate artifact rows changed the rewrite")
  }

  test("bpe vocab: usage table matches hand counts; token recovery is lossless") {
    val merges = Seq("t" -> "h", "th" -> "e")
    // doc1: the|the,n|o,n   doc2: the   doc3: o,n
    val docs = Seq((1L, "the then on"), (2L, "the"), (3L, "on"))
      .toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.bpeVocab(docs, merges, topK = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // expected (uses desc, tok asc): n×3 over 2 docs (then/on/on),
    // the×3 over 2 docs (the/then/the), o×2 over 2 docs
    assert(out.toSeq == Seq(("n", 1, 3L, 2L), ("the", 3, 3L, 2L), ("o", 1, 2L, 2L)),
      s"vocab table diverged: ${out.toSeq}")
  }

  test("bpe apply: same-symbol runs merge greedily left-to-right like a sequential encoder") {
    val merges = Seq("o" -> "o")
    val docs = Seq((1L, "oooo"), (2L, "ooo")).toDF("doc_id", "text")
    val out = graft.queries.CurationQueries.applyBpe(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // [o,o,o,o] → [oo,oo]; [o,o,o] → [oo,o] — exactly the sequential fold
    assert(out(1L) == 2L, s"oooo: ${out(1L)}")
    assert(out(2L) == 2L, s"ooo: ${out(2L)}")
  }

  // ---------------------------------------------------------------- cdc
  test("cdc chunks: boundaries survive a prefix insertion (shift-robustness)") {
    // THE property content-defined chunking buys over fixed-size
    // chunking: prepending text shifts every byte offset, but boundaries
    // depend only on local 4-char windows, so after the first boundary
    // past the edit the chunk stream resynchronizes and the remaining
    // chunk hashes are identical.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "INSERTED PREFIX " + base)).toDF("doc_id", "text")
    val ch = graft.queries.CurationQueries.cdcChunks(docs).collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    val common = h1.intersect(h2)
    assert(h1.size >= 4, s"base doc should chunk into several pieces: ${h1.size}")
    // boundaries are local 4-char properties, so the chunk stream
    // resynchronizes at the first boundary past the edit: at most the
    // head chunk (plus the one it merged into) differs
    assert(common.size >= h1.size - 2,
      s"CDC must resynchronize after the edit: ${common.size} of ${h1.size} shared")
    // fixed-size chunking would share (almost) nothing under a 16-char
    // offset shift; CDC shares everything but the head
    assert(h1 != h2, "the edited doc is not byte-identical")
  }

  test("cdc chunks: native expression ≡ the interpreted HOF boundary chain") {
    // the r17 CdcChunks expression runs the whole boundary scan + digest
    // in one compiled pass; this pins row-set equality against an inline
    // copy of the OLD four-HOF Column chain over adversarial strings:
    // empty, sub-4-char, boundary-dense periodic text, multi-byte chars,
    // seeded random ASCII, plus real corpus docs
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh XYZ.,!?0123456789\néü中"
    val synth = Seq("", "a", "abc", "abcd", "abcde", "aaaa" * 50,
      "héllo wörld — 中文文本 mixed ascii and not",
      ("ab" * 100) + "cd") ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(300))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = synth.zipWithIndex
      .map { case (t, i) => (8000000L + i, t) }.toDF("doc_id", "text")
      .unionByName(table(spark, sf("sf0.001"), "documents")
        .select("doc_id", "text"))
    def refChain(d: org.apache.spark.sql.DataFrame) = {
      val L = length(col("text"))
      val codes = transform(split(col("text"), ""), c => ascii(c))
      def at(i: org.apache.spark.sql.Column) = element_at(col("codes"), i)
      val bs = when(L >= 4,
        filter(sequence(lit(4), L), i =>
          pmod(at(i - 3) * 29791 + at(i - 2) * 961 + at(i - 1) * 31 + at(i),
            lit(17)) === 0))
        .otherwise(array().cast("array<int>"))
      d.select(col("doc_id"), col("text"), codes.as("codes"))
        .select(col("doc_id"), col("text"), bs.as("bs"))
        .withColumn("ends",
          when(size(col("bs")) > 0 && element_at(col("bs"), -1) === L, col("bs"))
            .otherwise(concat(col("bs"), array(L))))
        .withColumn("starts",
          concat(array(lit(1)),
            transform(slice(col("ends"), lit(1), size(col("ends")) - 1), x => x + 1)))
        .select(col("doc_id"),
          explode(zip_with(col("starts"), col("ends"), (st, en) =>
            struct(md5(col("text").substr(st, en - st + 1).cast("binary")).as("h"),
              (en - st + 1).as("clen")))).as("c"))
        .select(col("doc_id"), col("c.h").as("h"), col("c.clen").as("clen"))
    }
    // chunk rows are a multiset per doc — compare (doc, h, clen) counts
    val cur = graft.queries.CurationQueries.cdcChunks(docs)
      .groupBy("doc_id", "h", "clen").count()
    val ref = refChain(docs).groupBy("doc_id", "h", "clen").count()
    val (nCur, nRef) = (cur.count(), ref.count())
    assert(nCur == nRef && cur.unionByName(ref).distinct().count() == nRef,
      s"CdcChunks differs from the HOF chain ($nCur vs $nRef distinct rows)")
  }

  test("cdc chunks: lossless partition of every doc (lengths sum to doc length)") {
    val docs = Seq((1L, "abcd"), (2L, "x"), (3L, ("y" * 257))).toDF("doc_id", "text")
    val sums = graft.queries.CurationQueries.cdcChunks(docs)
      .groupBy("doc_id").agg(sum("clen").as("tot")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums === Map(1L -> 4L, 2L -> 1L, 3L -> 257L))
  }

  // ---------------------------------------------------------------- bpe
  test("bpe pairs: frequency-weighted vocab counting matches hand count") {
    val docs = Seq((1L, "abab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    // vocab: abab×1 (pairs ab,ba,ab), ab×2 (pair ab), cd×1 (pair cd)
    // ⇒ ab: 2+2=4, ba: 1, cd: 1
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2)
    val pairs = words.select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs === Map("ab" -> 4L, "ba" -> 1L, "cd" -> 1L))
  }

  test("pagerank: AQE splits the skewed rank⋈edges shuffle on a power-law src key") {
    // the per-iteration join keys the edge list by src — a power-law hub
    // source skews that shuffle partition. At cluster scale the mitigation
    // is AQE's skew-join split (runtime re-plan, no code change); this pins
    // that the rewrite actually FIRES on a hub graph once the broadcast
    // escape hatch is off (at 100 TB the rank table is not broadcastable).
    val hub = (1L to 60000L).map(d => (0L, d))
    val rest = (1L to 200L).flatMap(s => (1L to 20L).map(d => (s, s * 1000 + d)))
    val und = hub ++ rest
    val skewConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // the split target is clamped to coalescePartitions.minPartitionSize
      // (default 1 MiB) — far above this fixture's ~320 KiB hub partition,
      // so without lowering it the rule judges the hub unsplittable. At
      // cluster scale hub partitions are GBs and the default is harmless.
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
      // the rank join's output co-partitioning feeds the dst groupBy, so
      // the conservative rule backs off (splitting adds a re-shuffle);
      // force it — trading one extra exchange for unsticking the hub
      // straggler is the right call on a power-law graph, and is the
      // deployment conf this spec documents
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // materialized inputs = the at-scale iteration shape (edge artifact
      // on disk, ranks checkpointed per round — pagerankFixedPoint's
      // materializeRanks mode): both join children are bare shuffle
      // reads, the ONLY shape AQE's skew rule pattern-matches. With
      // inline ranks the final HashAggregate sits between shuffle and
      // sort and the rewrite never fires (verified while building this).
      // repartition(16) before the checkpoint: skew splitting is
      // MAPPER-granular (a reduce partition subdivides only at map-output
      // boundaries), so a single-mapper fixture can never split — real
      // corpora always have many mappers
      val edges = Graph.withOutDegree((und ++ und.map(_.swap)).toDF("src", "dst"))
        .repartition(16).localCheckpoint()
      val ranks0 = edges.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L)).localCheckpoint()
      val df = Graph.pagerankStep(edges, ranks0)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("skew=true"),
        s"AQE skew-join rewrite did not fire on the hub shuffle:\n$plan")
      // and the materialized mode is value-identical to the lazy one
      val lazyR = Graph.pagerankFixedPoint(edges, 2).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val matR = Graph.pagerankFixedPoint(edges, 2, materializeRanks = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lazyR === matR, "materializeRanks must not change the fixed point")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("triangles: adjacency-intersection counts match a hand-checked graph") {
    // K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant edge
    // 4-5 (node 5 in none); symmetric edge list like copurchaseEdges emits
    val und = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, topN = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("triangles: degree orientation bounds hub state (id orientation would not)") {
    // star: hub 0 ↔ leaves 1..60, plus ring edges making 4 triangles
    // {0,1,2} {0,2,3} {0,1,3} {1,2,3}. Hub degree 60, leaf degree ≤ 3.
    val und = (1L to 60L).map(l => (0L, l)) ++ Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, topN = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $got")
    // the state bound the orientation buys: every forward-adjacency list
    // stays leaf-sized because low-degree endpoints point AT the hub
    val maxFwd = Graph.orientByDegree(edges)
      .groupBy("a").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxFwd <= 3L, s"degree orientation must bound hub state, got $maxFwd")
    // contrast: id orientation hands the low-id hub its full degree
    val idFwd = edges.filter(col("src") < col("dst"))
      .groupBy("src").count().agg(max("count")).collect()(0).getLong(0)
    assert(idFwd === 60L, s"control: id orientation should collect 60, got $idFwd")
  }

  test("link prediction: path graph scores the open pair; cap excludes hub centers") {
    // path 1—2—3: the only wedge is centered at 2 (deg 2) → candidate
    // (1,3) with one common neighbor and RA = 1000000 div 2 = 500000
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = Graph.withOutDegree((und ++ und.map(_.swap)).toDF("src", "dst"))
    val got = Graph.linkPredictRA(edges, maxCenterDeg = 32, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 500000L)), s"got ${got.toSeq}")

    // star: hub 0 ↔ leaves 1..40 plus edge 1—2. Uncapped, the hub center
    // wedges every leaf pair: C(40,2) − 1 existing = 779 candidates. With
    // the cap, hub wedges vanish and the only leaf-centered candidates
    // (0,1)/(0,2) are existing edges → empty. The cap IS the state bound.
    val star = (1L to 40L).map(l => (0L, l)) ++ Seq((1L, 2L))
    val sEdges = Graph.withOutDegree((star ++ star.map(_.swap)).toDF("src", "dst"))
    val uncapped = Graph.linkPredictRA(sEdges, maxCenterDeg = 50, topK = 1000).count()
    assert(uncapped == 779L, s"uncapped hub wedges: got $uncapped")
    val capped = Graph.linkPredictRA(sEdges, maxCenterDeg = 32, topK = 1000).count()
    assert(capped == 0L, s"capped: got $capped")
  }

  // --------------------------------------------------------------- scd2
  test("scd2: contiguous intervals, one current version per key, LWW-consistent") {
    val orders = table(spark, sf("sf0.001"), "orders")
      .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    val dim = Upsert.scd2(orders, "o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey").cache()
    try {
      // exactly one open interval per key
      val keys = dim.select("o_custkey").distinct().count()
      val current = dim.filter(col("is_current")).count()
      assert(current === keys, s"$current current rows for $keys keys")

      // intervals chain: valid_to(version k) == valid_from(version k+1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("version")
      val broken = dim
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
        .count()
      assert(broken === 0L, "validity intervals must chain without gaps")

      // consecutive versions always change the attribute
      val noChange = dim
        .withColumn("prev_attr", lag("o_orderpriority", 1).over(w))
        .filter(col("prev_attr").isNotNull && col("prev_attr") === col("o_orderpriority"))
        .count()
      assert(noChange === 0L, "consecutive versions with identical attr = not compressed")

      // the open version agrees with CDC log compaction (latest per key)
      val latest = Upsert.latestPerKey(orders, Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderpriority").as("lww_attr"))
      val disagree = dim.filter(col("is_current"))
        .join(latest, "o_custkey")
        .filter(col("o_orderpriority") =!= col("lww_attr"))
        .count()
      assert(disagree === 0L, "current SCD2 version must equal LWW compaction")
    } finally dim.unpersist()
  }

  // -------------------------------------------------------- fuzzy linkage
  test("fuzzy linkage: salt-capped grid ≡ uncapped pairs, and hot blocks actually split") {
    // a deliberately hot block: 40 near-identical docs sharing one 8-char
    // prefix (one-char tail variants, all within lev 5 of each other)
    // plus unrelated filler — maxBlock=8 forces a 5×5 salt grid
    val hot = (0 until 40).map(i =>
      (100L + i, "en", s"shared prefix text variant $i"))
    val cold = (0 until 20).map(i =>
      (500L + i, "en", s"totally unrelated document number $i with padding"))
    val docs = (hot ++ cold).toDF("doc_id", "lang", "text")
    val uncapped = Dedup.fuzzyPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val capped = Dedup.fuzzyPairsCapped(docs, maxBlock = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(uncapped.nonEmpty, "fixture must produce in-block pairs")
    assert(capped === uncapped, "salting must preserve the exact pair set")
    // and the grid actually engaged: the hot block's 40 rows at
    // maxBlock=8 give s=5, so the left side replicates 5× per hot row
    assert(capped.count(p => p._1 >= 100L && p._1 < 140L) > 0,
      "hot-block pairs must survive the grid")
  }

  // ------------------------------------------------------- empty inputs
  test("empty inputs: scd2, triangles, bm25, fuzzy pairs all yield empty, not errors") {
    val noOrders = table(spark, sf("sf0.001"), "orders").limit(0)
    assert(Upsert.scd2(noOrders.select("o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey"), "o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey").count() === 0L)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.triangleCounts(noEdges, 10).count() === 0L)
    assert(Graph.pagerankFixedPoint(Graph.withOutDegree(noEdges), 3).count() === 0L)
    val noDocs = table(spark, sf("sf0.001"), "documents").limit(0)
    assert(TextStats.bm25(noDocs, Seq("hash"), 5).count() === 0L)
    assert(Dedup.fuzzyPairs(noDocs).count() === 0L)
  }

  // --------------------------------------------------------------- bm25
  test("bm25: more matching occurrences → higher score; non-matching docs absent") {
    val docs = Seq(
      (1L, "hash hash hash join filler words here"),
      (2L, "hash join filler words here padding x"),
      (3L, "no relevant terms at all in this one")).toDF("doc_id", "text")
    val out = TextStats.bm25(docs, Seq("hash", "join"), topN = 10).collect()
    val scores = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.contains(1L) && scores.contains(2L) && !scores.contains(3L))
    assert(scores(1L) > scores(2L), s"tf monotonicity: $scores")
    assert(scores.values.forall(_ > 0.0))
  }

  // ------------------------------------------------- round-7 warehouse ops
  test("snapshot_diff classifies every derived change and nothing else") {
    val out = graft.SparkEntry.queries("snapshot_diff")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keys = table(spark, sf("sf0.001"), "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    // ground truth from the derivation: %101 deleted (wins over %97),
    // %103 re-keyed as inserts, %97 updated unless deleted
    val deletes = keys.filter(_ % 101 == 0).toSet
    val updates = keys.filter(k => k % 97 == 0 && k % 101 != 0).toSet
    val inserts = keys.filter(_ % 103 == 0).map(_ + 10000000L).toSet
    assert(out.collect { case (k, "delete") => k }.toSet == deletes)
    assert(out.collect { case (k, "update") => k }.toSet == updates)
    assert(out.collect { case (k, "insert") => k }.toSet == inserts)
    assert(out.length == deletes.size + updates.size + inserts.size)
  }

  test("bucketized interval overlap equals the direct theta join") {
    val li = table(spark, sf("sf0.001"), "lineitem")
      // SAME transit derivation as the registered join_interval_overlap
      // (l_orderkey-keyed, not l_quantity): the equivalence pin must
      // exercise the exact interval distribution the shipped query joins
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship_from"))
      .withColumn("ship_to",
        expr("date_add(ship_from, cast(l_orderkey % 25 + 3 as int))"))
      .localCheckpoint()
    val promo = li.select(trunc(col("ship_from"), "month").as("promo_from"))
      .distinct().withColumn("promo_to", date_add(col("promo_from"), 6))
      .localCheckpoint()
    // direct theta join (the plan the operator exists to avoid)
    val want = li.crossJoin(promo)
      .filter(col("ship_from") <= col("promo_to") &&
        col("ship_to") >= col("promo_from"))
      .groupBy("promo_from").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    val got = li.withColumn("m",
        explode(expr("sequence(trunc(ship_from, 'month'), trunc(ship_to, 'month'), interval 1 month)")))
      .join(promo.select(col("promo_from").as("m"), col("promo_from"),
        col("promo_to")), Seq("m"))
      .filter(col("ship_from") <= col("promo_to") &&
        col("ship_to") >= col("promo_from"))
      .groupBy("promo_from").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty)
  }

  test("compliance_forget: kept + purged equals each dataset's total; purge is complete") {
    val rows = graft.SparkEntry.queries("compliance_forget")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.queries.Registry.events(spark, sf("sf0.001"))
    val evTotal = ev.count()
    val purchTotal = ev.filter(col("event_type") === "purchase").count()
    val dailyTotal = ev.groupBy(col("user_id"), col("ts").cast("date")).count().count()
    assert(rows("events")._1 + rows("events")._2 == evTotal)
    assert(rows("purchases")._1 + rows("purchases")._2 == purchTotal)
    assert(rows("user_daily")._1 + rows("user_daily")._2 == dailyTotal)
    // completeness: purged count equals the direct filter count
    val evPurged = ev.filter(col("user_id") % 37 === 0).count()
    assert(rows("events")._2 == evPurged)
    assert(rows.values.forall(_._2 > 0), "forget-set must actually hit rows")
  }

  // -------------------------------------------------------- winnowing
  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Scalar reference winnowing: distinct (hash, pos) selected as the min
    * of each w-window of k-gram hashes, ties broken rightmost. */
  private def refWinnow(tokens: Seq[String], k: Int = 4, w: Int = 5): Set[(String, Int)] = {
    val grams = tokens.sliding(k).filter(_.size == k).zipWithIndex
      .map { case (g, i) => (md5hex(g.mkString(" ")), i + 1) }.toVector
    if (grams.size < w) Set.empty
    else grams.sliding(w).map(_.minBy { case (h, p) => (h, -p) }).toSet
  }

  test("winnowing: shared run of k+w-1 tokens guarantees a shared fingerprint") {
    val run = (1 to 8).map(i => s"s$i").mkString(" ") // k+w-1 = 8 tokens
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5"),
      (2L, s"b1 b2 b3 b4 b5 b6 $run"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"), // unique tokens
      (4L, "v1 v2 v3 v4 v5"), // 5 tokens: 2 grams < w windows → 0 fps
      (5L, "w1 w2 w3")        // < k tokens → no grams, absent
    ).toDF("doc_id", "text")
    val out = graft.ext.Winnow.stats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the winnowing guarantee: both planted docs share ≥1 fingerprint
    assert(out(1L)._3 >= 1L, s"doc1 must share a fingerprint: ${out(1L)}")
    assert(out(2L)._3 >= 1L, s"doc2 must share a fingerprint: ${out(2L)}")
    assert(out(3L)._3 == 0L, s"unique doc shares nothing: ${out(3L)}")
    assert(out(4L) == ((2L, 0L, 0L)), s"sub-w doc emits no fingerprints: ${out(4L)}")
    assert(!out.contains(5L), "sub-k docs emit no grams (mirrors the oracle)")
    // density: fingerprints never exceed full windows (n_grams - w + 1)
    assert(out(1L)._2 <= out(1L)._1 - 4, s"doc1 density: ${out(1L)}")
  }

  test("winnowing: distributed counts == scalar reference on a collision-rich corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 12).map(i => s"t$i") // tiny vocab forces hash ties
    val planted = (1 to 10).map(i => s"p$i") // ≥ k+w-1 run shared by ids % 3 == 0
    val corpus = (1L to 20L).map { id =>
      val n = 3 + rnd.nextInt(30)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      id -> (if (id % 3 == 0) body ++ planted else body)
    }
    val docs = corpus.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
    val out = graft.ext.Winnow.stats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val fpsByDoc = corpus.map { case (id, t) => id -> refWinnow(t) }.toMap
    val hashDocs = fpsByDoc.toSeq
      .flatMap { case (id, fps) => fps.map(f => f._1 -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.foreach { case (id, t) =>
      val nGrams = math.max(t.size - 3, 0).toLong
      if (nGrams == 0) assert(!out.contains(id), s"doc $id must be absent")
      else {
        val fps = fpsByDoc(id)
        val shared = fps.count(f => hashDocs(f._1).size >= 2).toLong
        assert(out(id) == ((nGrams, fps.size.toLong, shared)),
          s"doc $id: got ${out(id)} want ($nGrams, ${fps.size}, $shared)")
      }
    }
    // the corpus must actually exercise sharing and tie-breaks
    assert(out.values.exists(_._3 > 0), "fixture must produce shared fingerprints")
  }

  test("winnow pairs: matches scalar reference; 1-fp pairs dropped; hub fingerprints capped") {
    val run16 = (1 to 16).map(i => s"r$i").mkString(" ") // long run → ≥2 shared fps
    val run8 = (1 to 8).map(i => s"q$i").mkString(" ")
    val hub = (1 to 10).map(i => s"h$i").mkString(" ")
    val docs =
      Seq((1L, s"a1 a2 a3 $run16"), (2L, s"b1 b2 b3 b4 $run16"), // strong pair
        (3L, s"c1 c2 c3 c4 c5 $run8"), (4L, s"d1 d2 d3 d4 d5 d6 $run8"), // weak pair
        (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")) ++ // unique
        (100L to 160L).map(i => (i, hub)) // 61 identical docs → every fp df=61 > cap
    val df = docs.toDF("doc_id", "text")
    val out = graft.ext.Winnow.pairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // scalar reference: winnow each doc, pair on shared hashes with the
    // same df ∈ [2, 50] cap and n_shared ≥ 2 gate
    val fpsByDoc = docs.map { case (id, t) =>
      id -> refWinnow(t.trim.split("\\s+").toSeq).map(_._1)
    }.toMap
    val dfreq = fpsByDoc.toSeq.flatMap { case (id, fs) => fs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val ids = docs.map(_._1)
    val expected = (for {
      a <- ids; b <- ids if a < b
      shared = (fpsByDoc(a) intersect fpsByDoc(b))
        .count(h => dfreq(h) >= 2 && dfreq(h) <= 50)
      if shared >= 2
    } yield {
      val (na, nb) = (fpsByDoc(a).size.toLong, fpsByDoc(b).size.toLong)
      (a, b) -> ((shared.toLong, na, nb,
        BigDecimal(shared.toDouble / math.min(na, nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    assert(out == expected, s"got $out\nwant $expected")
    assert(out.contains((1L, 2L)), "the 16-token run must pair")
    assert(!out.keySet.exists(p => p._1 >= 100L && p._2 >= 100L),
      "hub-fingerprint docs must not pair (df cap)")
    assert(!out.contains((3L, 4L)) || expected((3L, 4L))._1 >= 2L)
  }

  test("winnow ingest: 2-batch fold == full pairs restricted to batch-touching; replay idempotent") {
    val run = (1 to 16).map(i => s"s$i").mkString(" ")
    // doc 2 carries the shared run TWICE (an internally repeated run):
    // the same fingerprint hash is selected at two positions, and the
    // ingest path must distinct-collapse it exactly like pairsFrom does
    // (regression: a non-distinct batchFps inflated nd/n_shared/n_fp)
    val b1 = Seq(
      (1L, s"a1 a2 a3 $run"),
      (2L, s"b1 b2 b3 b4 $run x1 x2 x3 $run"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
    val b2 = Seq(
      (10L, s"c1 c2 $run"), // pairs cross-batch with 1 AND 2
      (11L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"))
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_winnow_ing")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    Winnow.ingestBatch(b1.toDF("doc_id", "text"), idx, out, 0L)
    Winnow.ingestBatch(b2.toDF("doc_id", "text"), idx, out, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "containment")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(t => (t._1, t._2)).toSeq
    val want = rows(Winnow.pairs(all))
    // every pair in this fixture touches some batch at its arrival, so
    // the per-batch outputs union to exactly the full run
    assert(rows(spark.read.parquet(out)) == want,
      "incremental pair union diverged from the full run")
    // the fixture must exercise cross-batch pairing (10 pairs with 1 and 2)
    assert(want.exists(p => p._1 < 10L && p._2 >= 10L),
      "no cross-batch pair — fixture degenerate")
    // the standing index serves the same pairs as the inline form
    val served = rows(Winnow.pairsFrom(
      spark.read.schema(Winnow.IndexSchema).parquet(idx)))
    assert(served == want, "index-served pairs diverged from inline")
    // perturbed-layout replay of batch 1: outputs and serving unchanged
    Winnow.ingestBatch(
      b2.toDF("doc_id", "text").orderBy(desc("doc_id")).repartition(5),
      idx, out, 1L)
    assert(rows(spark.read.parquet(out)) == want, "replay changed batch output")
    assert(rows(Winnow.pairsFrom(
      spark.read.schema(Winnow.IndexSchema).parquet(idx))) == want,
      "replay-duplicated index rows leaked into served pairs")
  }

  test("winnow ingest: fingerprint crossing maxDf between batches pins the time-of-arrival divergence") {
    // The DOCUMENTED incremental caveat (Winnow.ingestBatch scaladoc):
    // the maxDf hub cap is evaluated over the corpus AS OF each batch.
    // Four identical docs, cap 3: batch 1 ships three (df=3, in-cap →
    // pairs emitted); batch 2 ships the fourth (df=4 > cap → it emits
    // NOTHING through the now-hub hash, and the earlier pairs are
    // permanently retained even though a full re-run over the final
    // index would exclude them). This pin makes the contract regression-
    // proof in BOTH directions: retained history AND silent later batch.
    val run = (1 to 16).map(i => s"m$i").mkString(" ")
    val b1 = Seq((1L, run), (2L, run), (3L, run))
    val b2 = Seq((4L, run))
    val root = java.nio.file.Files.createTempDirectory("graft_winnow_df")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    Winnow.ingestBatch(b1.toDF("doc_id", "text"), idx, out, 0L, maxDf = 3)
    val afterB1 = spark.read.parquet(out)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB1 == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"batch 1 at df=3 must pair all three: $afterB1")
    Winnow.ingestBatch(b2.toDF("doc_id", "text"), idx, out, 1L, maxDf = 3)
    val afterB2 = spark.read.parquet(out)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB2 == afterB1,
      "the cap-crossing batch must emit nothing AND retain earlier pairs")
    // a full pairs re-run over the final index sees df=4 > cap everywhere
    val rerun = Winnow.pairsFrom(
      spark.read.schema(Winnow.IndexSchema).parquet(idx), maxDf = 3)
    assert(rerun.isEmpty, "full re-run over the crossed-cap index must be empty")
  }

  test("graph_degree_stats: hand K3-plus-pendant graph matches the MLE closed form") {
    val dir = java.nio.file.Files.createTempDirectory("graft_degfix").toString
    // order 10 buys parts {1,2,3} (a triangle), order 11 buys {3,4}:
    // degrees 1→2, 2→2, 3→3, 4→1; hist {1:1, 2:2, 3:1}
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.SparkEntry.queries("graph_degree_stats")(spark, dir)
      .collect().head
    assert(r.getLong(0) == 4L, "n_nodes")
    assert(r.getLong(1) == 4L, "n_edges (directed 8 / 2)")
    assert(r.getLong(2) == 3L, "max_deg")
    assert(r.getLong(3) == 2000L, "mean_deg_x1000 = 8000/4")
    assert(r.getLong(4) == 3L, "n_tail (deg >= 2)")
    val lsum = 2.0 * math.log(2.0 / 1.5) + math.log(3.0 / 1.5)
    val want = BigDecimal(1.0 + 3.0 / lsum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == want, s"alpha: ${r.getDouble(5)} vs $want")
  }
}
