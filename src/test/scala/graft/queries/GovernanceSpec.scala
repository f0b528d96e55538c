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
}
