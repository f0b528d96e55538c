package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Seeded sampling surface — train/test splits and stratified sampling,
  * the data-mixing ops a training pipeline runs. Engine-specific RNG means
  * no cross-engine oracle; what must hold is determinism under a fixed
  * seed and the statistical contract. */
class SamplingSpec extends SparkSpec {

  test("dedup_index_audit: per-band pair_mass equals the band's direct self-join pair count") {
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("dedup_index_audit")(spark, dir).collect()
    assert(rows.length == 8, s"expected 8 band rows, got ${rows.length}")
    // recompute one band's candidate-pair count directly from the same
    // standing artifact the audit read: pair_mass must be EXACTLY the
    // number of intra-bucket unordered pairs that band contributes
    val sh = graft.ext.Dedup.shingleRows(
      graft.ext.Dedup.planted(table(spark, dir, "documents").select("doc_id", "text"))).distinct()
    val banded = graft.ext.Dedup.bandedSignatures(sh).filter(col("band") === 0)
    val direct = banded.as("a").join(banded.as("b"),
        col("a.bhash") === col("b.bhash") && col("a.doc_id") < col("b.doc_id"))
      .count()
    val audited = rows.find(_.getAs[Int]("band") == 0).get.getAs[Long]("pair_mass")
    assert(audited == direct, s"band 0 pair_mass $audited != direct self-join count $direct")
  }

  test("corpus_mix_plan: rate/epoch arithmetic is exactly the floor/ceil of the allocation") {
    val rows = graft.SparkEntry.queries("corpus_mix_plan")(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = r.getAs[Long]("nat_tokens"); val desired = r.getAs[Long]("desired_tokens")
      val rate = r.getAs[Long]("rate_ppm"); val epochs = r.getAs[Long]("epochs")
      if (nat == 0L) assert(rate == 0L && epochs == 0L)
      else {
        assert(rate == desired * 1000000L / nat, s"rate not floor(desired*1e6/nat) in $r")
        assert(epochs == (rate + 999999L) / 1000000L, s"epochs not ceil(rate) in $r")
      }
    }
    // natural shares sum to 1e6 up to per-source floor rounding
    val natSum = rows.map(_.getAs[Long]("natural_ppm")).sum
    assert(natSum <= 1000000L && natSum >= 1000000L - rows.length,
      s"natural_ppm sum $natSum outside floor-rounding band")
  }

  test("corpus_mix_schedule: realized stream is bounded by the plan's rate floor/ceil; deterministic") {
    val plan = graft.SparkEntry.queries("corpus_mix_plan")(spark, sf("sf0.001")).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("rate_ppm"))).toMap
    val run1 = graft.SparkEntry.queries("corpus_mix_schedule")(spark, sf("sf0.001")).collect()
    assert(run1.nonEmpty)
    run1.foreach { r =>
      val (nDocs, rate) = plan(r.getAs[String]("source"))
      val full = rate / 1000000L
      val copies = r.getAs[Long]("emitted_copies")
      val docs = r.getAs[Long]("emitted_docs")
      // every doc emits `full` or `full+1` copies — the stream cannot
      // stray outside the plan's floor/ceil band
      assert(copies >= full * nDocs && copies <= (full + 1L) * nDocs,
        s"copies $copies outside [$full, ${full + 1}]×$nDocs for $r")
      assert(docs <= nDocs)
      if (full >= 1L) assert(docs == nDocs, s"full epoch must emit every doc: $r")
    }
    // pure function of (corpus, seeds): checksum and counts reproduce
    val run2 = graft.SparkEntry.queries("corpus_mix_schedule")(spark, sf("sf0.001")).collect()
    assert(run1.toSeq == run2.toSeq)
  }

  test("pack_budget_sweep: monotone tradeoff and bin-count agreement with pack_sequences") {
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("pack_budget_sweep")(spark, dir)
      .collect().sortBy(_.getAs[Long]("budget"))
    assert(rows.length == 3)
    // bigger budget => fewer fragmented docs, fewer sequences
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_frag_docs") <= a.getAs[Long]("n_frag_docs"))
        assert(b.getAs[Long]("n_bins") <= a.getAs[Long]("n_bins"))
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("waste_tokens") ==
        r.getAs[Long]("n_bins") * r.getAs[Long]("budget") - r.getAs[Long]("total_tokens"))
    }
    // the 8192 row's sequence count equals an INDEPENDENT per-lang ceil
    // recompute, and upper-bounds pack_sequences' row count (its rows are
    // bins some doc STARTS in; chunking can emit a final sequence no doc
    // starts in, so equality is not an invariant)
    val expect = table(spark, dir, "documents")
      .groupBy("lang")
      .agg(sum(graft.ext.TextStats.bpeTokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => (r.getAs[Long]("t") + 8191L) / 8192L).sum
    assert(rows.last.getAs[Long]("n_bins") == expect,
      s"sweep n_bins ${rows.last.getAs[Long]("n_bins")} != independent ceil sum $expect")
    val startBins = graft.SparkEntry.queries("pack_sequences")(spark, dir).count()
    assert(rows.last.getAs[Long]("n_bins") >= startBins,
      s"sweep n_bins below pack_sequences' starting-bin count $startBins")
  }

  test("quality_tuning_sweep: 9 monotone rows; tau=0.5 row equals the classifier's keep gate") {
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("quality_tuning_sweep")(spark, dir)
      .collect()
    assert(rows.length == 9, s"expected all 9 threshold rows, got ${rows.length}")
    // kept docs/tokens are non-increasing in tau: score >= tau nests
    val kept = rows.sortBy(_.getAs[Long]("tau_ppm"))
      .map(r => (r.getAs[Long]("n_docs_kept"), r.getAs[Long]("n_tokens_kept")))
    kept.sliding(2).foreach {
      case Array((d1, t1), (d2, t2)) =>
        assert(d2 <= d1 && t2 <= t1, s"kept counts not monotone: $kept")
      case _ => ()
    }
    // the tau=0.5 row is the classifier's EXACT gate: logit(0.5)=0, so
    // score >= 0.5 <=> w_sum >= 0. The classifier's `keep` FLAG is the
    // round-6 sigmoid (it also admits w_sum = -1/-2, which round to
    // 0.500000), so the pin compares against the exact w_sum >= 0 count,
    // not the flag.
    val mid = rows.find(_.getAs[Long]("tau_ppm") == 500000L).get
    val gate = graft.SparkEntry.queries("quality_classifier")(spark, dir)
      .filter(col("w_sum") >= 0L).count()
    assert(mid.getAs[Long]("n_docs_kept") == gate,
      s"sweep tau=0.5 kept ${mid.getAs[Long]("n_docs_kept")} != exact classifier gate $gate")
  }

  test("randomSplit: deterministic, disjoint, complete") {
    val docs = table(spark, sf("sf0.01"), "documents")
    val Array(train1, test1) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    val Array(train2, test2) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    val (t1, v1) = (train1.select("doc_id").collect().map(_.getLong(0)).toSet,
      test1.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(t1 == train2.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(v1 == test2.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert((t1 & v1).isEmpty)
    assert(t1.size + v1.size == docs.count())
    val frac = t1.size.toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("sampleBy: seeded stratified sampling honors per-stratum fractions") {
    val docs = table(spark, sf("sf0.01"), "documents")
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0, "es" -> 0.25, "zh" -> 0.25)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    assert(s1.select("doc_id").collect().toSeq == s2.select("doc_id").collect().toSeq)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"))
    assert(byLang("de") == base("de"))
    val enRate = byLang("en").toDouble / base("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en sample rate $enRate")
  }

  test("sample_negatives: never emits a positive, ≤4 probes per user, in-domain items") {
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("sample_negatives")(spark, dir).collect()
    assert(out.nonEmpty)
    val sampled = out.map(r => (r.getLong(0), r.getLong(2))).toSet
    val pos = table(spark, dir, "orders")
      .select(col("o_custkey").as("u"), col("o_orderkey"))
      .join(table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey").as("item")),
        col("o_orderkey") === col("l_orderkey"))
      .select("u", "item").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled.intersect(pos).isEmpty, "a sampled negative was actually purchased")
    val perUser = out.groupBy(_.getLong(0))
    assert(perUser.values.forall(_.length <= 4))
    val maxPart = table(spark, dir, "part").agg(max("p_partkey")).collect().head.getLong(0)
    assert(out.forall { r => val it = r.getLong(2); it >= 1 && it <= maxPart })
    // deterministic: same output on a second evaluation
    val again = graft.SparkEntry.queries("sample_negatives")(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("feature_hash: bucket math matches a hand-computed fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fhash").toString
    Seq((1L, "alpha alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % 256
    }
    val out = graft.SparkEntry.queries("feature_hash")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: alpha×2, beta×1 → two buckets unless md5 prefixes collide
    val collide = bucket("alpha") == bucket("beta")
    assert(out(1L) == (if (collide) (1L, 9L, 3L) else (2L, 5L, 2L)))
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("TABLESAMPLE via SQL is seed-deterministic") {
    table(spark, sf("sf0.01"), "documents").createOrReplaceTempView("docs_v")
    def run() = spark.sql(
      "SELECT doc_id FROM docs_v TABLESAMPLE (20 PERCENT) REPEATABLE (99)")
      .collect().map(_.getLong(0)).toSeq
    assert(run() == run())
  }

  test("sample_temperature: τ=2 upsamples the small source past its share; deterministic") {
    // skewed fixture corpus: 90 "big" docs vs 10 "small" docs. With τ=2
    // the sampling weight is sqrt(n): small's rate must land ABOVE the
    // uniform 25% budget (upsampled) and big's below it.
    val dir = java.nio.file.Files.createTempDirectory("graft_temp_sample").toString
    spark.range(100).select(
        col("id").as("doc_id"),
        concat(lit("doc "), col("id")).as("text"),
        lit("en").as("lang"),
        when(col("id") < 90, "big").otherwise("small").as("source"),
        lit(10L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = graft.SparkEntry.queries("sample_temperature")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = run()
    assert(out.nonEmpty)
    assert(out.toSeq == run().toSeq, "hash-threshold sampling must be deterministic")
    val rates = out.map(r => r._2 -> r._3).toMap
    assert(rates.contains("big") && rates.contains("small"),
      s"both sources must appear in the sample: $rates")
    assert(rates("small") > 2500L && rates("big") < 2500L,
      s"τ=2 must upsample small (got ${rates("small")}) and downsample big (${rates("big")})")
    // rates match the fixed-point formula exactly
    def s6(n: Long) = math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    val (z6, ntot) = (s6(90) + s6(10), 100L)
    def rate(n: Long) = math.min(10000L, s6(n) * (ntot / 4) * 10000L / (z6 * n))
    assert(rates("big") == rate(90) && rates("small") == rate(10), s"$rates")
  }
}
