package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral pins for the StatsQueries family: hand-computed fixtures
  * for the closed-form statistics, plus registered-query sanity runs at
  * sf0.001 (the oracle hash-gates the full semantics at sf0.01).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("stats_regression: exact line y=2x+1 fits slope 2, intercept 1, r2 1") {
    // Route the registered closed form over a fixture lineitem dir.
    val dir = java.nio.file.Files.createTempDirectory("graft_statsfix").toString
    Seq(("A", 1.0, 3.0), ("A", 2.0, 5.0), ("A", 3.0, 7.0),
        ("B", 1.0, 10.0), ("B", 2.0, 8.0), ("B", 3.0, 6.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.SparkEntry.queries("stats_regression")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A") == ((3L, 2.0, 1.0, 1.0)))
    assert(out("B") == ((3L, -2.0, 12.0, 1.0))) // perfect negative fit
  }

  test("stats_mad_outliers: planted spike is the only modified-z outlier") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statsfix").toString
    Seq(("O", 1.0), ("O", 2.0), ("O", 3.0), ("O", 4.0), ("O", 5.0), ("O", 100.0))
      .toDF("o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.SparkEntry.queries("stats_mad_outliers")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    // median 3.5; |x−3.5| = [2.5,1.5,0.5,0.5,1.5,96.5] → MAD 1.5;
    // mz(100) = 0.6745·96.5/1.5 ≈ 43.4 — the one outlier; inliers avg 3.
    assert(row.getAs[Long]("n") == 6L)
    assert(row.getAs[Double]("med") == 3.5)
    assert(row.getAs[Double]("mad") == 1.5)
    assert(row.getAs[Long]("n_outliers") == 1L)
    assert(row.getAs[Double]("avg_inlier") == 3.0)
  }

  test("stats_abtest: Welch t and Satterthwaite df match the hand computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statsfix").toString
    // arm a (even user_id): [10,12,14] → mean 12, var 4
    // arm b (odd user_id):  [20,24]    → mean 22, var 8
    // se² = 4/3 + 8/2 = 16/3; t = −10/√(16/3) = −4.3301
    // df = (16/3)² / ((4/3)²/2 + 4²/1) = 28.4444/16.8889 = 1.6842 → 1.68
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((2L, "purchase", 10.0, ts), (4L, "purchase", 12.0, ts),
        (6L, "purchase", 14.0, ts), (1L, "purchase", 20.0, ts),
        (3L, "purchase", 24.0, ts), (5L, "view", 999.0, ts))
      .toDF("user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = graft.SparkEntry.queries("stats_abtest")(spark, dir).collect().head
    assert(row.getAs[Long]("n_a") == 3L)
    assert(row.getAs[Long]("n_b") == 2L)
    assert(row.getAs[Double]("mean_a") == 12.0)
    assert(row.getAs[Double]("mean_b") == 22.0)
    assert(row.getAs[Double]("welch_t") == -4.3301)
    assert(row.getAs[Double]("welch_df") == 1.68)
    assert(row.getAs[Double]("rel_lift_b") == 0.833333)
  }

  test("agg_hll_rollup: day-sketch union equals the single-level sketch") {
    // Mergeability — the property the two-level rollup rests on: unioning
    // per-day sketches must estimate the same set as one direct sketch
    // (HLL registers are element-wise max, so union == rebuild).
    val df = (1 to 200).map { i => (i.toLong % 60, s"d${i % 3}") }
      .toDF("user_id", "d")
    val daily = df.groupBy("d").agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
    val rolled = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false)))
      .head().getLong(0)
    val direct = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
      .head().getLong(0)
    assert(rolled == direct)
    // 60 distinct users; lgK=12 keeps small cardinalities near-exact
    assert(math.abs(rolled - 60L) <= 2L)
  }

  test("stats_psi: identical halves score zero drift; a shifted half scores positive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psifix").toString
    // even/odd orderkeys carry IDENTICAL value multisets → every bin has
    // n_ref == n_cur → every contribution is exactly 0.0
    val same = (1L to 200L).map(k => (k, 100.0 + (k / 2) % 50))
    same.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val zero = graft.SparkEntry.queries("stats_psi")(spark, dir).collect()
    assert(zero.nonEmpty)
    assert(zero.forall(_.getAs[Double]("psi_contrib") == 0.0),
      s"identical distributions must have zero PSI: ${zero.mkString(",")}")
    // shift the odd (current) half up by 40: drift must register
    val dir2 = java.nio.file.Files.createTempDirectory("graft_psifix").toString
    val shifted = (1L to 200L).map(k =>
      (k, 100.0 + (k / 2) % 50 + (if (k % 2 == 1) 40.0 else 0.0)))
    shifted.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val drift = graft.SparkEntry.queries("stats_psi")(spark, dir2).collect()
      .map(_.getAs[Double]("psi_contrib")).sum
    assert(drift > 0.1, s"shifted distribution must show PSI drift, got $drift")
  }

  test("count-min: one-sided bound, column≡JVM estimates, partition-invariant") {
    import graft.functions.CountMin
    val keys = (1L to 500L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k * 104729L))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def build(parts: Int): CountMin.Buf =
      keys.toDF("k").repartition(parts).as[Long]
        .select(new CountMin.CmsAggregator().toColumn)
        .collect().head
    val sk = build(4)
    // merge order cannot matter: counters identical across partitionings
    assert(sk.counters.toSeq == build(13).counters.toSeq && sk.n == keys.size)
    // one-sided error: never underestimates
    exact.foreach { case (k, n) =>
      assert(CountMin.estimate(sk, k) >= n, s"key $k underestimated")
    }
    // the declared-arithmetic Column form must equal the JVM point query
    val skDf = keys.toDF("k").as[Long]
      .select(new CountMin.CmsAggregator().toColumn)
      .select(struct(col("n"), col("counters")).as("sk"))
    val got = exact.keys.toSeq.toDF("k").crossJoin(broadcast(skDf))
      .select(col("k"), CountMin.estimateColumn(col("sk.counters"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.keys.foreach { k =>
      assert(got(k) == CountMin.estimate(sk, k), s"column/JVM estimate drift at $k")
    }
  }

  test("registered stats queries run non-empty at sf0.001 with sane ranges") {
    val reg = graft.SparkEntry.queries
    val regr = reg("stats_regression")(spark, sf("sf0.001")).collect()
    assert(regr.nonEmpty)
    regr.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
    val mad = reg("stats_mad_outliers")(spark, sf("sf0.001")).collect()
    assert(mad.nonEmpty)
    mad.foreach { r =>
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n"))
      assert(r.getAs[Double]("mad") >= 0.0)
    }
    val ab = reg("stats_abtest")(spark, sf("sf0.001")).collect()
    assert(ab.length == 1)
    assert(ab.head.getAs[Long]("n_a") > 0 && ab.head.getAs[Long]("n_b") > 0)
    val hll = reg("agg_hll_rollup")(spark, sf("sf0.001")).collect()
    assert(hll.nonEmpty)
    assert(hll.forall(_.getAs[Long]("approx_users") > 0))
  }

  test("stats_kstest: matches the brute-force ECDF computation at sf0.001") {
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("stats_kstest")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val rows = Registry.table(spark, dir, "documents")
      .select(col("n_chars"), col("lang")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val a = rows.filter(_._2 == "en").map(_._1)
    val b = rows.filter(_._2 != "en").map(_._1)
    def ecdf(xs: Array[Long], v: Long) = xs.count(_ <= v).toDouble / xs.length
    val vs = rows.map(_._1).distinct.sorted
    val gaps = vs.map(v => (math.abs(ecdf(a, v) - ecdf(b, v)), v))
    val maxGap = gaps.map(_._1).max
    val atV = gaps.filter(_._1 == maxGap).map(_._2).min
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    assert(math.abs(r.getAs[Double]("d_stat") - maxGap) < 1e-6,
      s"d_stat ${r.getAs[Double]("d_stat")} vs brute $maxGap")
    assert(r.getAs[Long]("d_at_v") == atV,
      s"argmax v ${r.getAs[Long]("d_at_v")} vs brute $atV")
  }

  test("stats_chisq: hand 2×2 table matches the textbook statistic; empty cells present") {
    // fixture: lang en/de × source a/b with obs [[30,10],[10,30]] plus a
    // source c seen only for en — the grid must still emit (de, c) with
    // obs 0. Textbook chi2 for the 2×2 block: margins 40/40, N=80 →
    // e=20 each, contrib (10)^2/20 = 5 per cell.
    val dir = java.nio.file.Files.createTempDirectory("graft_chisq").toString
    val rows = Seq.fill(30)(("en", "a")) ++ Seq.fill(10)(("en", "b")) ++
      Seq.fill(10)(("de", "a")) ++ Seq.fill(30)(("de", "b"))
    rows.zipWithIndex.map { case ((l, src), i) => (i.toLong, s"t $i", l, src, 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("stats_chisq")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.size == 4)
    assert(out(("en", "a")) == ((30L, 20000000L, 5.0)))
    assert(out(("de", "b")) == ((30L, 20000000L, 5.0)))
    assert(out(("en", "b"))._3 == 5.0 && out(("de", "a"))._3 == 5.0)
    // chi2 total = 20, dwarfing the 3.84 critical value — dependence found
    assert(math.abs(out.values.map(_._3).sum - 20.0) < 1e-9)

    // empty-cell coverage: add one (en, c) doc — the (de, c) cell must
    // appear with obs 0 and a positive expected count
    (rows :+ (("en", "c"))).zipWithIndex
      .map { case ((l, src), i) => (i.toLong, s"t $i", l, src, 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out2 = graft.SparkEntry.queries("stats_chisq")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out2.size == 6, s"full grid must include empty cells: ${out2.keys}")
    assert(out2(("de", "c")) == 0L)
  }

  test("curation_attrition: stage chain is a consistent funnel at sf0.001") {
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("curation_attrition")(spark, dir).collect()
    assert(out.length == 4)
    val byStage = out.sortBy(_.getAs[Int]("stage"))
    byStage.foreach { r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_in") - r.getAs[Long]("n_out"))
    }
    byStage.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("n_in") == w(0).getAs[Long]("n_out"),
        "stage k input must be stage k-1 survivors")
    }
    val docs = Registry.table(spark, dir, "documents")
    assert(byStage.head.getAs[Long]("n_in") == graft.ext.Dedup.planted(docs).count())
    // fingerprint dedup drops at least the planted exact copies
    val exactCopies = docs.filter(col("doc_id") % 20 === 0).count()
    assert(byStage.head.getAs[Long]("n_dropped") >= exactCopies)
  }

  test("stats_mannwhitney: hand fixture matches doubled-unit U and tie-corrected z; label swap is antisymmetric") {
    // en lengths [1,2,3] vs rest [2,4]: #(a>b)=1 (3>2), one tie at 2 →
    // 2·U_A = 3; tt = 2³−2 = 6; σ² = (6/12)·(6 − 6/20) = 2.85;
    // z = (3−6)/(2·√2.85) = −0.888523 (6dp).
    val dir = java.nio.file.Files.createTempDirectory("graft_mwufix").toString
    def write(d: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    write(dir, Seq((1L, "en", 1L), (2L, "en", 2L), (3L, "en", 3L),
      (4L, "xx", 2L), (5L, "xx", 4L)))
    val r = graft.SparkEntry.queries("stats_mannwhitney")(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2_a") == 3L)
    assert(r.getAs[Long]("tie_cubes") == 6L)
    assert(r.getAs[Double]("z") == -0.888523)
    // swapping group labels must give u2_b = 2·na·nb − u2_a (rank-sum
    // antisymmetry) — pins that ties are split, not double-counted
    val dir2 = java.nio.file.Files.createTempDirectory("graft_mwufix").toString
    write(dir2, Seq((1L, "xx", 1L), (2L, "xx", 2L), (3L, "xx", 3L),
      (4L, "en", 2L), (5L, "en", 4L)))
    val r2 = graft.SparkEntry.queries("stats_mannwhitney")(spark, dir2).collect().head
    assert(r2.getAs[Long]("u2_a") == 2L * 3L * 2L - 3L)
    assert(r2.getAs[Double]("z") == 0.888523)
  }

  test("stats_mannwhitney: all-tied input yields NULL z, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mwufix").toString
    Seq((1L, "en", 7L), (2L, "xx", 7L), (3L, "xx", 7L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("stats_mannwhitney")(spark, dir).collect().head
    assert(r.getAs[Long]("u2_a") == 1L * 2L) // all ties: 2U = #ties
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("stats_bootstrap: exact fixture mean, CI inside the value range, deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bootfix").toString
    // two purchases at 10.0 / 20.0 (+ a view that must be ignored):
    // every replicate mean is a count-weighted mean of 1e7 and 2e7
    Seq((1L, "purchase", 10.0), (2L, "purchase", 20.0), (3L, "view", 999.0))
      .toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val run1 = graft.SparkEntry.queries("stats_bootstrap")(spark, dir).collect()
    assert(run1.length == 1)
    val r = run1.head
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Long]("mean6") == 15000000L)
    val nReps = r.getAs[Long]("n_reps")
    // Poisson(1) drops a 2-row replicate w.p. e⁻² ≈ 0.135 — most survive
    assert(nReps >= 30L && nReps <= 48L, s"implausible replicate count $nReps")
    val lo = r.getAs[Long]("boot_lo6"); val hi = r.getAs[Long]("boot_hi6")
    assert(lo >= 10000000L && hi <= 20000000L && lo <= hi)
    // pure function of (data, fixed seed): rerun must be identical
    val run2 = graft.SparkEntry.queries("stats_bootstrap")(spark, dir).collect()
    assert(run1.toSeq == run2.toSeq)
  }

  test("stats_bootstrap: no purchases → empty output, not a division error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bootfix").toString
    Seq((3L, "view", 1.0)).toDF("event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(graft.SparkEntry.queries("stats_bootstrap")(spark, dir).collect().isEmpty)
  }

  test("embed_drift: hand fixture — orthogonal, identical, and empty snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("graft_driftfix").toString
    // label 0: snapshot A = [1,0], B = [0,1] → cos 0, shift √2 = 1.414214
    // label 1: identical [3,4] both sides → cos 1, shift 0
    // label 2: even vec_id only → empty B snapshot must NULL, not error
    Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0f, 1f), 0),
      (2L, Array(3f, 4f), 1),
      (3L, Array(3f, 4f), 1),
      (4L, Array(1f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("embed_drift")(spark, dir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(out.size == 3)
    val l0 = out(0)
    assert(l0.getAs[Long]("n_a") == 1L && l0.getAs[Long]("n_b") == 1L)
    assert(l0.getAs[Double]("cos") == 0.0)
    assert(l0.getAs[Double]("shift") == 1.414214)
    val l1 = out(1)
    assert(l1.getAs[Double]("cos") == 1.0 && l1.getAs[Double]("shift") == 0.0)
    val l2 = out(2)
    assert(l2.getAs[Long]("n_a") == 1L && l2.getAs[Long]("n_b") == 0L)
    assert(l2.isNullAt(l2.fieldIndex("cos")) && l2.isNullAt(l2.fieldIndex("shift")))
  }

  test("stats_anova: hand fixture — textbook F and eta^2; single group yields NULL F") {
    val dir = java.nio.file.Files.createTempDirectory("graft_anovafix").toString
    // a: {2,4} (mean 3), b: {8,10} (mean 9) → SSB=36, SSW=4,
    // F = (36/1)/(4/2) = 18, eta² = 36/40 = 0.9, grand mean 6.
    Seq((0L, "a", 2L), (1L, "a", 4L), (2L, "b", 8L), (3L, "b", 10L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("stats_anova")(spark, dir).collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("mean4") == 60000L)
    assert(r.getAs[Double]("f_stat") == 18.0)
    assert(r.getAs[Double]("eta_sq") == 0.9)

    val dir1 = java.nio.file.Files.createTempDirectory("graft_anovafix1").toString
    Seq((0L, "a", 2L), (1L, "a", 4L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    val r1 = graft.SparkEntry.queries("stats_anova")(spark, dir1).collect().head
    assert(r1.isNullAt(r1.fieldIndex("f_stat")), "k=1 must yield NULL F")
    assert(r1.getAs[Double]("eta_sq") == 0.0)
  }

  test("stats_anova: equal-mean groups with flooring skew clamp to F=0, never negative") {
    // a {1,0,0} (q6g floors to 333333) and b {1,1,0,0,0,0} (666666):
    // qb = 999999 < ⌊stot²·10⁶/n⌋ = 1000000 — without the clamp this
    // emits F ≈ −4e-6. Clamped: F = 0, eta² = 0.
    val dir = java.nio.file.Files.createTempDirectory("graft_anovaclamp").toString
    (Seq((0L, "a", 1L), (1L, "a", 0L), (2L, "a", 0L)) ++
      Seq((3L, "b", 1L), (4L, "b", 1L)) ++
      (5L to 8L).map(i => (i, "b", 0L)))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("stats_anova")(spark, dir).collect().head
    assert(r.getAs[Double]("f_stat") == 0.0, r.toString)
    assert(r.getAs[Double]("eta_sq") == 0.0, r.toString)
  }

  test("stats_anova: per-group micro-unit squares beyond int64 stay exact (DECIMAL floor division)") {
    // sg = 10 · 10⁹ = 10¹⁰ per group → sg²·10⁶/ng = 10²⁵ ≫ 2⁶³: the old
    // `div` (long-returning) form overflowed here; the DECIMAL remainder
    // form must return the exact F for two equal-variance groups.
    val dir = java.nio.file.Files.createTempDirectory("graft_anovabig").toString
    val big = 1000000000L
    ((0 until 10).map(i => (i.toLong, "a", big + (i % 2))) ++
      (10 until 20).map(i => (i.toLong, "b", 2 * big + (i % 2))))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("stats_anova")(spark, dir).collect().head
    // SSB = 20·(5e8)² = 5e18·10⁶ micro; SSW = 20·0.25 = 5 → 5·10⁶ micro;
    // F = (SSB/1)/(SSW/18) = 18·1e18 = 1.8e19.
    assert(r.getAs[Long]("n") == 20L)
    // ssb6/ssw6 are exact integers (5·10²⁴ / 5·10⁶); the final double is
    // within ulps of F = 1.8e19
    assert(math.abs(r.getAs[Double]("f_stat") / 1.8e19 - 1.0) < 1e-12, r.toString)
    assert(r.getAs[Double]("eta_sq") == 1.0, r.toString)
  }

  test("stats_autocorr: linear series r=1, constant series NULL, short series has no lag-7 row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_acfix").toString
    // type x daily counts 1,2,3,4,5 → lag-1 r = 1 over 4 pairs; type y
    // constant 2,2,2 → zero variance ⇒ NULL r over 2 pairs. Only 5 days
    // of data, so the lag-7 leg joins empty and emits NO row at all.
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def day(d: Int) = new java.sql.Timestamp(ts0.getTime + d * 86400000L)
    val rows = (0 until 5).flatMap(d =>
      (0 until (d + 1)).map(i => (d * 100L + i, day(d), 1L, "x", 1.0, "{}"))) ++
      (0 until 3).flatMap(d =>
        (0 until 2).map(i => (9000L + d * 10 + i, day(d), 1L, "y", 1.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("stats_autocorr")(spark, dir).collect()
    assert(out.length == 2, s"expected exactly the two lag-1 rows: ${out.toSeq}")
    val x = out.find(_.getAs[String]("event_type") == "x").get
    assert(x.getAs[Int]("lag") == 1 && x.getAs[Long]("n_pairs") == 4L)
    assert(x.getAs[Double]("r") == 1.0)
    val y = out.find(_.getAs[String]("event_type") == "y").get
    assert(y.getAs[Long]("n_pairs") == 2L && y.isNullAt(y.fieldIndex("r")))
  }

  test("embed_outliers: hand fixture — minority-direction vector ranks first; zero vector filtered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_outfix").toString
    // label 0: two [1,0] + one [0,1] → centroid sums [2e6, 1e6];
    // cos([1,0]) = 2/√5 = 0.894427, cos([0,1]) = 1/√5 = 0.447214 —
    // the minority direction must rank as the top outlier. The zero
    // vector has no cosine and must be filtered, not NULL-ranked.
    Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("embed_outliers")(spark, dir).collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(out.length == 3, s"zero vector must be filtered: ${out.toSeq}")
    assert(out.head == ((1, 2L, 0.447214)))
    assert(out(1)._3 == 0.894427 && out(2)._3 == 0.894427)
    assert(out(1)._2 == 0L && out(2)._2 == 1L) // cos tie → vec_id order
  }

  // ------------------------------------------------------------- cusum
  /** Scalar CUSUM recursion reference — the textbook form the closed
    * form must reproduce: S⁺ᵢ = max(0, S⁺ᵢ₋₁ + c·10⁶ − μ6 − κ6). */
  private def refCusum(cs: Seq[Long]): Seq[(Long, Long, Boolean)] = {
    val n = cs.size
    val mu6 = cs.sum * 1000000L / n
    val k6 = mu6 / 20
    val thresh = BigInt(mu6) * 25000000L
    var sp = 0L; var sn = 0L
    cs.map { c =>
      sp = math.max(0L, sp + c * 1000000L - mu6 - k6)
      sn = math.max(0L, sn + mu6 - c * 1000000L - k6)
      (sp, sn, BigInt(sp) * sp > thresh || BigInt(sn) * sn > thresh)
    }
  }

  test("stats_cusum: closed form == scalar recursion (shifted, noisy, constant series)") {
    val rnd = new scala.util.Random(7)
    val series = Map(
      "shift" -> ((1 to 30).map(_ => 100L) ++ (1 to 20).map(_ => 150L)),
      "noisy" -> (1 to 50).map(_ => 90L + rnd.nextInt(21)),
      "flat"  -> (1 to 50).map(_ => 100L))
    val rows = series.toSeq.flatMap { case (ty, cs) =>
      cs.zipWithIndex.map { case (c, i) =>
        (ty, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), c)
      }
    }
    val out = graft.queries.StatsQueries.cusum(rows.toDF("event_type", "d", "c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    series.foreach { case (ty, cs) =>
      val ref = refCusum(cs)
      cs.indices.foreach { i =>
        val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString
        assert(out((ty, d)) == ref(i),
          s"$ty day $i: got ${out((ty, d))} want ${ref(i)}")
      }
    }
    // behavioral pins: the flat series never alarms; the shifted series'
    // UPPER side first crosses only after the level shift (day 31+)
    assert(refCusum(series("flat")).forall(!_._3), "flat series must not alarm")
    val shiftRef = refCusum(series("shift"))
    val mu6 = series("shift").sum * 1000000L / 50
    val firstUp = shiftRef.indexWhere(s => BigInt(s._1) * s._1 > BigInt(mu6) * 25000000L)
    assert(firstUp >= 30, s"upper CUSUM must fire only post-shift, got day $firstUp")
    assert(firstUp > 0, "the planted shift must actually fire the upper side")
  }

  test("events_forecast_eval: hand series — constant is perfectly predicted, period-7 by seasonal only") {
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // "flat": constant 10 for 15 days → both baselines exact (mae 0)
    // "weekly": period-7 pattern 10,10,10,10,10,10,40 → seasonal-naive
    //   exact; naive misses at both edges of each spike
    val weekly = (0 until 21).map(i => if (i % 7 == 6) 40L else 10L)
    val rows = (0 until 15).map(i => ("flat", day(i), 10L)) ++
      weekly.zipWithIndex.map { case (c, i) => ("weekly", day(i), c) }
    val out = graft.queries.StatsQueries.forecastEval(
      rows.toDF("event_type", "d", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("flat", "naive")) == ((14L, 0L, 0L)))
    assert(out(("flat", "seasonal")) == ((8L, 0L, 0L)))
    assert(out(("weekly", "seasonal")) == ((14L, 0L, 0L)),
      s"seasonal-naive must nail a period-7 series: ${out(("weekly", "seasonal"))}")
    // naive on weekly: 20 lag-1 pairs, error 30 at each spike edge
    // (2 edges per week × ~3 weeks): days 6,7,13,14,20 → |e|=30, 15 others 0
    // hand: n=20, sum|e| = 5*30 = 150 → mae6 = 150*1e6/20 = 7_500_000
    // smape per spike-edge day: 2*30*1e6 // (40+10) = 1_200_000; sum = 6e6
    // → smape6 = 6_000_000 // 20 = 300_000
    assert(out(("weekly", "naive")) == ((20L, 7500000L, 300000L)),
      s"naive on weekly: ${out(("weekly", "naive"))}")
  }

  test("events_survival: curve equals the KM product on a hand lifetime set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_surv").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")
    // lifetimes: users 1,2 → 0 days; user 3 → 2; user 4 → 5 (N=4)
    Seq((1L, 1L, ts(0)), (2L, 2L, ts(3)),
        (3L, 3L, ts(0)), (4L, 3L, ts(2)),
        (5L, 4L, ts(1)), (6L, 4L, ts(4)), (7L, 4L, ts(6)))
      .toDF("event_id", "user_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("events_survival")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    // KM product telescopes to exact fractions:
    // t=0: (1-2/4)=0.5; t=2: 0.5·(1-1/2)=0.25; t=5: 0.25·(1-1/1)=0
    assert(out.toSeq == Seq(
      0L -> ((4L, 2L, 0.5)),
      2L -> ((2L, 1L, 0.25)),
      5L -> ((1L, 1L, 0.0))))
  }

  test("corpus_concentration: hand Gini on skewed and uniform source mixes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gini").toString
    // volumes 10/20/70: S=1·10+2·20+3·70=260, T=100, n=3 →
    // gini = 2·260/300 − 4/3 = 0.4; top1 = 0.7, top3 = 1.0
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "c", 40L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("corpus_concentration")(spark, dir)
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 100L)
    assert(r.getDouble(2) == 0.4, s"gini: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.7 && r.getDouble(4) == 1.0)

    val dir2 = java.nio.file.Files.createTempDirectory("graft_gini").toString
    // perfectly uniform mix → gini exactly 0
    Seq((1L, "a", 50L), (2L, "b", 50L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val u = graft.SparkEntry.queries("corpus_concentration")(spark, dir2)
      .collect().head
    assert(u.getDouble(2) == 0.0 && u.getDouble(3) == 0.5 && u.getDouble(4) == 1.0)
  }

  test("stats_spearman: monotone ±1 and the hand tie case") {
    def run(rows: Seq[(Double, Double)]): (Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_spear").toString
      rows.toDF("l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val r = graft.SparkEntry.queries("stats_spearman")(spark, dir).collect().head
      (r.getLong(0), r.getDouble(1))
    }
    // any strictly monotone map is rank-perfect, even a nonlinear one
    assert(run(Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0))) == ((3L, 1.0)))
    assert(run(Seq((1.0, 9.0), (2.0, 4.0), (3.0, 1.0))) == ((3L, -1.0)))
    // ties: q=(1,1,2) → 2·avg-ranks (3,3,6); p=(5,7,9) → (2,4,6);
    // hand Pearson on ranks = 18/√432 = 0.866025
    assert(run(Seq((1.0, 5.0), (1.0, 7.0), (2.0, 9.0))) == ((3L, 0.866025)))
  }

  test("calibrationReport: hand bins, score-1.0 absorption, weighted ECE row") {
    import graft.ext.Analytics
    val scored = Seq(
      (1L, 0.05, 1L), (2L, 0.05, 0L),              // bin 0
      (3L, 0.95, 1L), (4L, 0.95, 1L), (5L, 1.0, 0L)) // bin 9 (1.0 absorbed)
      .toDF("id", "score", "label")
    val out = Analytics.calibrationReport(scored).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((2L, 50000L, 500000L, 450000L)))
    assert(out(9L) == ((3L, 966666L, 666666L, 300000L)))
    // rollup: weighted means of the per-bin integer-div values
    assert(out(-1L) == ((5L, 599999L, 599999L, 360000L)))
    assert(out.size == 3)
  }
}
