package graft.plans

import org.scalacheck.Gen

import graft.SparkSpec

/** [[TopKPerGroup]]'s bounded-heap exec against a scalar sort-take on
  * arbitrary data with a 4-value sort-key domain — constant ties, where a
  * heap comparator that drops the tiebreaker (or compares in the wrong
  * direction on the second column) returns a DIFFERENT valid-looking
  * top-k. k spans 1, mid, and ≥ every group size (the no-eviction edge:
  * the heap never fills, exercising the emit-all path).
  */
class TopKPropSpec extends SparkSpec {

  private val rowGen = for {
    g <- Gen.choose(0L, 5L)
    v <- Gen.choose(0L, 3L) // heavy first-key ties → tiebreaker decides
  } yield (g, v)

  private def scalarTopK(rows: Seq[(Long, Long, Long)], k: Int)
      : Seq[(Long, Int, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, grp) =>
      grp.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
        .map { case ((_, v, id), i) => (g, i + 1, v, id) }
    }.sortBy(r => (r._1, r._2))

  test("heap top-k ≡ scalar sort-take for k ∈ {1, 3, 50} on 15 tied datasets") {
    import spark.implicits._
    (1 to 15).foreach { i =>
      val rows = Gen.listOfN(60, rowGen).sample.get.zipWithIndex.map {
        case ((g, v), id) => (g, v, id.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      for (k <- Seq(1, 3, 50)) { // 50 > any group size: heap never evicts
        val got = TopKPerGroup(df, k, Seq("g"), Seq(("v", false), ("id", true)))
          .select("g", "rn", "v", "id").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSeq.sortBy(r => (r._1, r._2))
        assert(got == scalarTopK(rows, k), s"top-$k divergence on case $i")
      }
    }
  }
}
