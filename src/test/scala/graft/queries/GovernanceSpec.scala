package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand fixtures for the governance pair: the k-anonymity/l-diversity
  * audit and the per-user contribution cap.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("privacy_kanon: class sizes, band diversity, and risk flags on a planted grid") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kanon").toString
    // (0,A): 5 rows over bands {0,1,2} → no risk; (0,B): 3 rows one band
    // → both risks; (1,A): 6 rows bands {0,1} → l-risk only; (2,C): 5
    // rows bands {-1,0,1} — the negative-balance floor(-500/2000) = -1.
    val rows = Seq(
      (0, "A", 100.0), (0, "A", 150.0), (0, "A", 250.0),
      (0, "A", 2100.0), (0, "A", 4100.0),
      (0, "B", 10.0), (0, "B", 20.0), (0, "B", 30.0),
      (1, "A", 1.0), (1, "A", 2.0), (1, "A", 3.0),
      (1, "A", 2001.0), (1, "A", 2002.0), (1, "A", 2003.0),
      (2, "C", -500.0), (2, "C", -1.0), (2, "C", 100.0),
      (2, "C", 2100.0), (2, "C", 3999.0))
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.SparkEntry.queries("privacy_kanon")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out((0, "A")) == ((5L, 3L, 0, 0)))
    assert(out((0, "B")) == ((3L, 1L, 1, 1)))
    assert(out((1, "A")) == ((6L, 2L, 0, 1)))
    assert(out((2, "C")) == ((5L, 3L, 0, 0)), "negative floor band must count")
    assert(out.size == 4)
  }

  test("events_contribution_cap: earliest-20 kept, ts-primary order, vanished-type zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ucap").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: 25 views → 20 kept; user 2: 3 clicks, all kept; user 3:
    // 20 views (ts 1..20) then 2 purchases with EARLIER event_ids but
    // LATER ts (21, 22) — the cap must cut the purchases (ts-primary
    // ordering), leaving the purchase type with raw=2, capped=0.
    val ev =
      (1 to 25).map(i => (1000L + i, ts(i), 1L, "view", 1.0)) ++
      (1 to 3).map(i => (2000L + i, ts(i), 2L, "click", 1.0)) ++
      (1 to 20).map(i => (3000L + i, ts(i), 3L, "view", 1.0)) ++
      Seq((90L, ts(21), 3L, "purchase", 1.0), (91L, ts(22), 3L, "purchase", 1.0))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("events_contribution_cap")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("view") == ((45L, 40L, 0.8889)))
    assert(out("click") == ((3L, 3L, 1.0)))
    assert(out("purchase") == ((2L, 0L, 0.0)),
      "beyond-cap-only type must report zero kept, not vanish")
    assert(out("*") == ((50L, 43L, 0.86)))
    assert(out.size == 4)

    // the heap node agrees with the reference row_number() window form
    val evDf = Registry.events(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val ref = evDf.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ref == Map("view" -> 40L, "click" -> 3L))
  }

  test("capIngestBatch: ts-ordered fold == batch earliest-cap; replay idempotent; cold start") {
    import graft.ext.Mining
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // cap=5. user 1: 3 events in batch 0 + 4 in batch 1 → keeps 3 + 2
    // (cross-batch quota); user 2: 7 events in batch 0 → keeps 5 within
    // one batch; user 3: arrives only in batch 1.
    val b0 = (1 to 3).map(i => (100L + i, 1L, ts(i), "view", 1.0)) ++
      (1 to 7).map(i => (200L + i, 2L, ts(i), "view", 1.0))
    val b1 = (4 to 7).map(i => (100L + i, 1L, ts(i), "click", 1.0)) ++
      Seq((300L, 3L, ts(9), "purchase", 2.0))
    def df(rows: Seq[(Long, Long, java.sql.Timestamp, String, Double)]) =
      rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("graft_caping")
    val ledger = root.resolve("ledger").toString
    val out = root.resolve("kept").toString
    Mining.capIngestBatch(df(b0), ledger, out, 0L, cap = 5) // cold start
    Mining.capIngestBatch(df(b1), ledger, out, 1L, cap = 5)
    def keptIds = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // batch reference: earliest-5 per user over the full ts-ordered log
    val w5 = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val want = df(b0 ++ b1).withColumn("rn", row_number().over(w5))
      .filter(col("rn") <= 5).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds == want, "ts-ordered ingest fold diverged from batch cap")
    assert(keptIds.filter(id => id >= 101L && id <= 107L)
        == Seq(101L, 102L, 103L, 104L, 105L),
      s"user 1 must keep 3 from batch 0 + first 2 of batch 1: $keptIds")
    // replay batch 1 with perturbed layout: output and ledger serving unchanged
    Mining.capIngestBatch(df(b1).orderBy(desc("event_id")).repartition(4),
      ledger, out, 1L, cap = 5)
    assert(keptIds == want, "replay changed the kept set")
    // a third batch still sees correct (duplicate-collapsed) quotas:
    // user 2 is at 5/5, so its new event must be dropped
    Mining.capIngestBatch(df(Seq((250L, 2L, ts(30), "view", 1.0))),
      ledger, out, 2L, cap = 5)
    assert(keptIds == want, "post-replay quota counting broke (duplicate ledger rows?)")
  }

  test("events_user_concentration: hand Gini and exact tied-boundary top shares") {
    def run(counts: Seq[Int]): (Long, Long, Double, Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_uconc").toString
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = counts.zipWithIndex.flatMap { case (c, u) =>
        (1 to c).map(i => (u * 1000L + i, u.toLong + 1L, t0))
      }
      rows.toDF("event_id", "user_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = graft.SparkEntry.queries("events_user_concentration")(spark, dir)
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    // counts [1,1,2,6]: sorted rank-sum 2Σi·x = 66 → G = 66/40 − 5/4 = 0.4;
    // k1 = k10 = 1 → the single heaviest user's 6/10
    assert(run(Seq(1, 1, 2, 6)) == ((4L, 10L, 0.4, 0.6, 0.6)))
    // 15 users ×1 + 5 users ×4: the top-10% cut (k=2) lands INSIDE the
    // tied c=4 group → exact partial share 2·4/35; Gini 960/700 − 21/20
    val (n, t, g, s1, s10) = run(Seq.fill(15)(1) ++ Seq.fill(5)(4))
    assert((n, t) == ((20L, 35L)))
    assert(g == BigDecimal(960.0 / 700.0 - 21.0 / 20.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"gini $g")
    assert(s1 == BigDecimal(4.0 / 35.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(s10 == BigDecimal(8.0 / 35.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
