package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[Upsert.latestPerKey]] / [[Upsert.merge]] LWW semantics on arbitrary
  * change logs. The registered `merge_upsert` query runs one real-data
  * shape; here a tiny (key, ts) domain makes order-column TIES constant —
  * the case where a missing tiebreaker silently picks a partition-
  * dependent winner — and the scalar fold below is the ground truth the
  * distributed rank-1 compaction must reproduce exactly.
  */
class UpsertPropSpec extends SparkSpec {

  /** (key, ts, uid, payload): uid is the unique DESC tiebreaker. */
  private val logGen: Gen[List[(Long, Long, Int, Int)]] =
    Gen.listOfN(50, for {
      k <- Gen.choose(0L, 5L)   // 6 keys / 50 rows → every key has ties
      ts <- Gen.choose(0L, 3L)  // 4 ts values → frequent exact ts ties
      p <- Gen.choose(0, 999)
    } yield (k, ts, p)).map(_.zipWithIndex.map {
      case ((k, ts, p), uid) => (k, ts, uid, p)
    })

  /** Scalar LWW: max by (ts, uid) per key. */
  private def scalarLatest(rows: Seq[(Long, Long, Int, Int)]): Map[Long, Int] =
    rows.groupBy(_._1).map { case (k, g) =>
      k -> g.maxBy(r => (r._2, r._3))._4
    }

  test("latestPerKey ≡ scalar max-by-(ts, uid) fold on 25 arbitrary tied logs") {
    import spark.implicits._
    (1 to 25).foreach { i =>
      val rows = logGen.sample.get
      val got = Upsert.latestPerKey(
          rows.toDF("k", "ts", "uid", "p"), Seq("k"),
          Seq(col("ts").desc, col("uid").desc))
        .select("k", "p").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == scalarLatest(rows), s"LWW divergence on case $i")
    }
  }

  test("merge: updated keys carry latest payload, base-only keys pass through, inserts appear") {
    import spark.implicits._
    (1 to 15).foreach { i =>
      val updRows = logGen.sample.get // keys 0..5
      val baseRows = (3L to 9L).map(k => (k, (k * 11).toInt)) // overlap 3..5, base-only 6..9
      val merged = Upsert.merge(
          baseRows.toDF("k", "bal"), updRows.toDF("k", "ts", "uid", "p"),
          Seq("k"), Seq(col("ts").desc, col("uid").desc))
        .select(col("k"), coalesce(col("p"), col("bal")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val latest = scalarLatest(updRows)
      val want = (baseRows.map { case (k, b) => k -> b }.toMap ++ latest)
      assert(merged == want, s"merge divergence on case $i")
      assert(merged.keySet == baseRows.map(_._1).toSet ++ latest.keySet,
        s"merge key set must be base ∪ update keys (case $i)")
    }
  }
}
