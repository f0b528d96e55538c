package graft.ext

import org.scalacheck.Gen

import graft.SparkSpec

/** [[Mining.capIngestBatch]]'s fold ≡ batch-cap identity on ARBITRARY
  * event logs. GovernanceSpec pins one hand fixture; here random logs
  * with heavy ts ties exercise the (ts, event_id) tie-break and the
  * cross-batch quota arithmetic. Batches split at a strict ts threshold
  * (equal-ts events never straddle a batch boundary — the identity's
  * precondition: within one batch the cap orders by (ts, event_id), so a
  * straddling tie could legitimately keep a different same-ts event than
  * the batch re-rank; a threshold split keeps ties together and makes
  * the identity exact). The scalar fold below is the ground truth.
  */
class CapPropSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, user_id, tsMinute): few users, few ts values → dense
    * ties; event_id unique. */
  private val logGen: Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(1L, 4L)   // 4 users / 40 rows → every user over cap
      t <- Gen.choose(0, 9)     // 10 ts values → constant ties
    } yield (u, t)).map(_.zipWithIndex.map {
      case ((u, t), i) => (100L + i, u, t)
    })

  /** Scalar earliest-cap per user by (ts, event_id). */
  private def scalarKept(rows: Seq[(Long, Long, Int)], cap: Int): Set[Long] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(r => (r._3, r._1)).take(cap).map(_._1)
    }.toSet

  test("capIngestBatch fold ≡ scalar earliest-cap on 8 arbitrary tied logs") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    (1 to 8).foreach { i =>
      val rows = logGen.sample.get
      val cut = 5 // strict ts threshold: ties never straddle the split
      val (b0, b1) = rows.partition(_._3 < cut)
      def df(rs: Seq[(Long, Long, Int)]) = rs
        .map { case (e, u, t) => (e, u, ts(t), "view", 1.0) }
        .toDF("event_id", "user_id", "ts", "event_type", "value")
      val root = java.nio.file.Files.createTempDirectory(s"graft_capprop$i")
      val ledger = root.resolve("ledger").toString
      val out = root.resolve("kept").toString
      Mining.capIngestBatch(df(b0), ledger, out, 0L, cap = 3)
      Mining.capIngestBatch(df(b1), ledger, out, 1L, cap = 3)
      val got = spark.read.parquet(out).select("event_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == scalarKept(rows, 3), s"cap fold divergence on case $i")
    }
  }
}
