package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[AsofJoin.lastEventBeforePurchase]] against a scalar fold on arbitrary
  * event sets with a tiny timestamp domain — constant exact-ts ties, where
  * the deterministic contract is ROW order under (ts, event_id): an event
  * at the SAME microsecond with a smaller event_id counts as "before".
  * The registered query exercises one real-data shape; this pins the tie
  * semantics the 100 TB single-shuffle window formulation must keep.
  */
class AsofPropSpec extends SparkSpec {

  private val eventGen = for {
    user <- Gen.choose(0L, 7L)
    typ <- Gen.oneOf("view", "click", "purchase")
    us <- Gen.choose(0L, 9L) // 10 distinct ts over ~50 events → dense ties
    v <- Gen.choose(0, 99)
  } yield (user, typ, us, v)

  /** (event_id, prev_event_id, prev_type, prev_us) per purchase, by the
    * scalar definition: previous row in per-user (ts, event_id) order. */
  private def scalarAsof(rows: Seq[(Long, Long, String, Long, Int)])
      : Seq[(Long, Option[Long], Option[String], Option[Long])] =
    rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(r => (r._4, r._1)) // (ts, event_id)
      ordered.zipWithIndex.collect {
        case ((eid, _, "purchase", _, _), i) =>
          val prev = if (i == 0) None else Some(ordered(i - 1))
          (eid, prev.map(_._1), prev.map(_._3), prev.map(_._4))
      }
    }.sortBy(_._1)

  test("lastEventBeforePurchase ≡ scalar previous-row fold on 25 tied event sets") {
    import spark.implicits._
    (1 to 25).foreach { i =>
      val rows = Gen.listOfN(50, eventGen).sample.get.zipWithIndex.map {
        case ((u, t, us, v), eid) => (eid.toLong, u, t, us, v)
      }
      val events = rows.toDF("event_id", "user_id", "event_type", "us", "value")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"), col("value"))
      val got = AsofJoin.lastEventBeforePurchase(events).collect().map { r =>
        (r.getLong(0),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[String]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))
      }.toSeq
      assert(got == scalarAsof(rows), s"as-of divergence on case $i")
    }
  }
}
