package graft.queries

import graft.SparkSpec

/** `quality_train` against a scalar fold of the EXACT integer-epoch
  * arithmetic on a hand-separable fixture: long English docs vs short
  * non-English ones. Pins (a) bit-exact weight trajectories (the whole
  * point of the fixed-point design), (b) convergence to the known signs
  * (longer ⇒ more likely en ⇒ w1, w2 end positive), (c) the empty-corpus
  * guard. */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  private def fd(a: Long, b: Long): Long = { val m = ((a % b) + b) % b; (a - m) / b }

  /** The spec's ground truth: the same 4 epochs over (y, x0, x1, x2)
    * rows, scalar. */
  private def scalarEpochs(rows: Seq[(Long, Long, Long, Long)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    var w = Vector(0L, 0L, 0L)
    (1 to 4).map { _ =>
      val r6s = rows.map { case (y, x0, x1, x2) =>
        val z = x0 * w(0) + x1 * w(1) + x2 * w(2)
        (Seq(x0, x1, x2), 500000L + fd(500000L * z, 1000000L + math.abs(z)) - y * 1000000L)
      }
      val n = math.max(rows.size.toLong, 1L)
      val sae = r6s.map { case (_, r) => math.abs(r) }.sum
      w = Vector.tabulate(3)(j =>
        w(j) - fd(r6s.map { case (x, r) => x(j) * r }.sum, n * 10))
      (w(0), w(1), w(2), sae, n)
    }
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_qt").toString
    rows.map { case (id, lang, text) =>
      (id, text, lang, "fix", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("separable fixture: bit-exact vs the scalar fold, signs converge positive") {
    val longText = (1 to 150).map(i => s"w$i").mkString(" ") // 150 toks, ~640 chars
    val shortText = "a b c d e"                              // 5 toks, 9 chars
    val docs = (1L to 3L).map(i => (i, "en", longText)) ++
      (4L to 6L).map(i => (i, "de", shortText))
    val dir = writeDocs(docs)
    val got = graft.SparkEntry.queries("quality_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // features exactly as the query derives them
    val feats = docs.map { case (_, lang, text) =>
      val tok = text.trim.split("\\s+").length.toLong
      (if (lang == "en") 1L else 0L, 1L,
        math.min(text.length.toLong, 2000L) / 100L, math.min(tok, 200L) / 10L)
    }
    val want = scalarEpochs(feats).zipWithIndex.map { case ((w0, w1, w2, sae, n), i) =>
      ((i + 1).toLong, n, w0, w1, w2, sae)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    val (_, _, w0, w1, w2, _) = got.last
    assert(w1 > 0 && w2 > 0,
      s"separable fixture must drive both size features positive: w=($w0,$w1,$w2)")
    // and the learned model separates the two classes: z(en-like) > 0 > z(de-like)
    val zs = feats.map { case (y, x0, x1, x2) => (y, x0 * w0 + x1 * w1 + x2 * w2) }
    assert(zs.forall { case (y, z) => if (y == 1L) z > 0 else z < 0 },
      s"decision boundary failed: $zs with w=($w0,$w1,$w2)")
  }

  test("quality_train_eval: hand fixture confusion matrix is exact; n_train from the weight frame") {
    // doc_id % 100 < 90 = train fold, >= 95 = test fold. Train: 3 long-en
    // + 3 short-de (separable, same as above, ids 1-6). Test: one of each
    // kind correctly labeled + one short doc labeled en (a guaranteed
    // false negative under the size-only features).
    val longText = (1 to 150).map(i => s"w$i").mkString(" ")
    val shortText = "a b c d e"
    val docs = (1L to 3L).map(i => (i, "en", longText)) ++
      (4L to 6L).map(i => (i, "de", shortText)) ++
      Seq((195L, "en", longText), (196L, "de", shortText), (197L, "en", shortText))
    val dir = writeDocs(docs)
    val r = graft.SparkEntry.queries("quality_train_eval")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (nTrain, nTest) = (row.getLong(0), row.getLong(1))
    val (tp, fp, fn, tn) = (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nTrain == 6L && nTest == 3L, s"folds: n_train=$nTrain n_test=$nTest")
    assert((tp, fp, fn, tn) == ((1L, 0L, 1L, 1L)),
      s"confusion: tp=$tp fp=$fp fn=$fn tn=$tn")
    assert(row.getLong(6) == (2L * 1000000L) / 3L, "acc_ppm")      // (tp+tn)/3
    assert(row.getLong(7) == 1000000L, "precision_ppm")            // 1/(1+0)
    assert(row.getLong(8) == 500000L, "recall_ppm")                // 1/(1+1)
  }

  test("empty corpus: 4 epochs of zero weights, no division error") {
    val dir = writeDocs(Seq.empty)
    val got = graft.SparkEntry.queries("quality_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == (1L to 4L).map(e => (e, 0L, 0L, 0L, 0L, 0L)),
      s"empty corpus must hold zero weights: ${got.toSeq}")
  }

  // --- hashed-feature trainer (quality_train_hashed + eval) ---------

  /** Scalar ground truth of the centered + Jacobi-preconditioned
    * hashed epochs: docs as (doc_id, y, slot→x6) maps incl. the
    * intercept slot −1 → 10⁶. */
  private def scalarHashed(docs: Seq[(Long, Long, Map[Long, Long])],
      k: Int): Seq[Map[Long, Long]] = {
    val n = docs.size.toLong
    val slots = docs.flatMap(_._3.keys).distinct.sorted
    val sx = slots.map(s => s -> docs.map(_._3.getOrElse(s, 0L)).sum).toMap
    val sxx = slots.map(s => s -> docs.map { d =>
      val x = d._3.getOrElse(s, 0L); x * x }.sum).toMap
    val m = slots.map(s =>
      s -> (if (s == -1L) 0L else fd(sx(s), math.max(n, 1L)))).toMap
    val den = slots.map { s =>
      val v = sxx(s) - 2 * m(s) * sx(s) + n * m(s) * m(s)
      s -> math.max(fd(v, 1000000L), n)
    }.toMap
    var w = slots.map(_ -> 0L).toMap
    (1 to k).map { _ =>
      val mm = slots.map(s => m(s) * w(s)).sum
      val rs = docs.map { case (_, y, f) =>
        val z = fd(f.map { case (s, x) => x * w(s) }.sum - mm, 1000000L)
        (f, 500000L + fd(500000L * z, 1000000L + math.abs(z)) - y * 1000000L)
      }
      val g = slots.map(s =>
        s -> rs.map { case (f, r) => f.getOrElse(s, 0L) * r }.sum).toMap
      val bigR = fd(g(-1L), 1000000L)
      w = slots.map(s => s -> (w(s) - fd((g(s) - m(s) * bigR) * 2, den(s)))).toMap
      w
    }
  }

  /** The query's feature derivation, scalar: slot-merged token counts
    * scaled to micro-frequencies + the stopword-rule label. The slot
    * assignment is read from the engine's own hash (the hash is not
    * what this spec pins; the exact ARITHMETIC is). */
  private def scalarFeats(docs: Seq[(Long, String)],
      slotOf: Map[String, Long]): Seq[(Long, Long, Map[Long, Long])] =
    docs.map { case (id, text) =>
      val ts = text.trim.toLowerCase.split("\\s+").toSeq
      val tot = math.max(ts.size.toLong, 1L)
      val sw = ts.count(_ == "the").toLong + ts.count(_ == "a").toLong
      val y = if ((1000000L * sw) / tot >= 70000L) 1L else 0L
      val f = ts.groupBy(slotOf).map { case (s, g) =>
        s -> (1000000L * g.size) / tot }
      (id, y, f + (-1L -> 1000000L))
    }

  private val qthHi = Seq("the the a a data query row",
    "the a the a table scan scan row", "the data a the a row the",
    "a the a value key the a")
  private val qthLo = Seq("data query table scan row value key",
    "join merge sort filter window agg", "value key join row scan table merge",
    "window agg filter sort merge join data")

  private def slotMap(texts: Seq[String]): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    val toks = texts.flatMap(_.split(" ")).distinct
    toks.toDF("tok")
      .select(col("tok"),
        pmod(xxhash64(lit("qth-seed"), col("tok")), lit(4096L)).as("slot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("quality_train_hashed: bit-exact vs the scalar centered+preconditioned fold") {
    val docs = (qthHi ++ qthLo).zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
    val dir = writeDocs(docs.map { case (id, t) => (id, "en", t) })
    val got = graft.SparkEntry.queries("quality_train_hashed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = scalarHashed(scalarFeats(docs, slotMap(docs.map(_._2))), 8)
      .zipWithIndex.flatMap { case (w, i) =>
        w.toSeq.sortBy(_._1).map { case (s, v) => ((i + 1).toLong, s, v) }
      }
    assert(got.toSeq == want, s"hashed fold diverged:\n${got.toSeq}\nvs\n$want")
  }

  test("quality_train_eval_hashed: genuine held-out separation on a stopword-rule fixture") {
    // train ids 1..8 (4 stopword-dense, 4 stopword-free), test ids
    // 195..198 (2 of each) — the hashed model must RECOVER the rule
    // out-of-sample from bag-of-words alone
    val docs = (qthHi ++ qthLo).zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) } ++
      Seq((195L, qthHi.head), (196L, qthHi(1)), (197L, qthLo.head), (198L, qthLo(1)))
    val dir = writeDocs(docs.map { case (id, t) => (id, "en", t) })
    val r = graft.SparkEntry.queries("quality_train_eval_hashed")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (nTrain, nTest) = (row.getLong(0), row.getLong(1))
    val (tp, fp, fn, tn) = (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nTrain == 8L && nTest == 4L, s"folds: n_train=$nTrain n_test=$nTest")
    assert((tp, fp, fn, tn) == ((2L, 0L, 0L, 2L)),
      s"hashed model must separate perfectly here: tp=$tp fp=$fp fn=$fn tn=$tn")
    assert(row.getLong(6) == 1000000L, "acc_ppm")
  }

  test("hashed empty corpus: zero rows, no division error") {
    val dir = writeDocs(Seq.empty)
    assert(graft.SparkEntry.queries("quality_train_hashed")(spark, dir).count() == 0L)
    val ev = graft.SparkEntry.queries("quality_train_eval_hashed")(spark, dir).collect()
    assert(ev.length == 1 && ev.head.getLong(0) == 0L && ev.head.getLong(1) == 0L)
  }
}
