package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[Sessionize.sessionize]] against a scalar split-fold on event sets
  * whose timestamps are multiples of HALF the session gap — consecutive
  * diffs land EXACTLY on the 30-minute threshold constantly, pinning the
  * strict-> boundary (a gap of exactly 30 min stays in-session; only a
  * LONGER silence splits), plus exact-ts ties resolved by event_id order.
  * Values are integer-valued doubles so the per-session sums are exact.
  */
class SessionizePropSpec extends SparkSpec {

  private val gapUs = 30L * 60L * 1000000L
  private val halfGap = gapUs / 2

  private val eventGen = for {
    user <- Gen.choose(0L, 5L)
    slot <- Gen.choose(0L, 12L) // ts = slot · gap/2 → diffs hit the exact threshold
    v <- Gen.choose(0, 50)
  } yield (user, slot * halfGap, v.toDouble)

  private def scalarSessions(rows: Seq[(Long, Long, Long, Double)])
      : Seq[(Long, Long, Long, Long, Double)] =
    rows.groupBy(_._2).toSeq.flatMap { case (user, g) =>
      val ordered = g.sortBy(r => (r._3, r._1)) // (us, event_id)
      val sessIdx = ordered.zip(None +: ordered.init.map(Some(_))).scanLeft(0L) {
        case (idx, (cur, prev)) =>
          idx + (if (prev.exists(p => cur._3 - p._3 > gapUs)) 1L else 0L)
      }.tail
      ordered.zip(sessIdx).groupBy(_._2).map { case (idx, sg) =>
        val us = sg.map(_._1._3)
        (user, idx, sg.size.toLong, us.max - us.min, sg.map(_._1._4).sum)
      }
    }.sortBy(r => (r._1, r._2))

  test("sessionize ≡ scalar split-fold with exact-threshold gaps on 25 event sets") {
    import spark.implicits._
    (1 to 25).foreach { i =>
      val rows = Gen.listOfN(40, eventGen).sample.get.zipWithIndex.map {
        case ((u, us, v), eid) => (eid.toLong, u, us, v)
      }
      val events = rows.toDF("event_id", "user_id", "us", "value")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("us")).as("ts"), col("value"))
      val got = Sessionize.sessionize(events).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1000000L), r.getDouble(4))
      }.toSeq
      assert(got == scalarSessions(rows), s"sessionize divergence on case $i")
    }
  }
}
