package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[Upsert.deltaJoinView]]'s 4-quadrant identity must hold for ARBITRARY
  * splits of both join sides — not just the date/modulus split the
  * registered `mv_join_delta` query exercises. A tiny key domain forces
  * multi-match keys (one delta row joins MANY old rows — the case where a
  * mis-assigned quadrant double-counts), and random split masks cover the
  * degenerate quadrants: dA = ∅ (no fact delta), dB = ∅ (no dim delta),
  * and the all-delta cold start with V_old = ∅. Row ids are unique, so
  * the sorted pair-list compare is a true multiset check — any
  * double-emitted or dropped join row breaks it.
  */
class IvmPropSpec extends SparkSpec {

  /** (key, isDelta) for one side; ids are assigned by position. */
  private val sideGen: Int => Gen[List[(Long, Boolean)]] = n =>
    Gen.listOfN(n, for {
      k <- Gen.choose(0L, 7L) // 8 keys over 40+15 rows → constant multi-match
      d <- Gen.oneOf(true, false)
    } yield (k, d))

  private def check(aRows: Seq[(Int, Long, Boolean)],
      bRows: Seq[(Int, Long, Boolean)], tag: String): Unit = {
    import spark.implicits._
    val a = aRows.toDF("a_id", "ak", "a_new")
    val b = bRows.toDF("b_id", "bk", "b_new")
    val cond = col("ak") === col("bk")
    val aOld = a.filter(!col("a_new")).drop("a_new")
    val dA = a.filter(col("a_new")).drop("a_new")
    val bOld = b.filter(!col("b_new")).drop("b_new")
    val dB = b.filter(col("b_new")).drop("b_new")
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    val got = pairs(Upsert.deltaJoinView(
      aOld.join(bOld, cond), aOld, dA, bOld, dB, cond))
    val want = pairs(a.drop("a_new").join(b.drop("b_new"), cond))
    assert(got == want,
      s"IVM identity broken ($tag): maintained ${got.size} pairs, " +
        s"recompute ${want.size}")
  }

  private def withIds(rows: List[(Long, Boolean)]): Seq[(Int, Long, Boolean)] =
    rows.zipWithIndex.map { case ((k, d), i) => (i, k, d) }

  test("deltaJoinView ≡ full-join recompute on 25 arbitrary tables and splits") {
    (1 to 25).foreach { i =>
      val as = withIds(sideGen(40).sample.get)
      val bs = withIds(sideGen(15).sample.get)
      check(as, bs, s"case $i")
    }
  }

  test("deltaJoinView edge quadrants: no deltas / one-sided delta / all-delta cold start") {
    val as = withIds(sideGen(30).sample.get)
    val bs = withIds(sideGen(12).sample.get)
    def forced(rows: Seq[(Int, Long, Boolean)], d: Boolean) =
      rows.map { case (i, k, _) => (i, k, d) }
    check(forced(as, false), forced(bs, false), "dA=∅, dB=∅ (view unchanged)")
    check(forced(as, true), forced(bs, false), "aOld=∅ on the fact side")
    check(forced(as, false), forced(bs, true), "bOld=∅ on the dim side")
    check(forced(as, true), forced(bs, true), "cold start: V_old=∅, all-delta")
  }
}
