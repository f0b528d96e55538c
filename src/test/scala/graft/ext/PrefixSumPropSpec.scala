package graft.ext

import org.scalacheck.Gen
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[PrefixSum.cumulative]] ≡ a single-partition unpartitioned-window
  * running sum on ARBITRARY weighted multisets (ties included: weights
  * collide constantly and values cluster so bucket boundaries land
  * mid-cluster). The consolidation contract for the five call sites
  * (kstest, mannwhitney, spearman, events_user_concentration,
  * pack_sequences): whatever bucketing the helper picks, the cumulative
  * sums must equal the global running sum exactly.
  */
class PrefixSumPropSpec extends SparkSpec {
  import spark.implicits._

  /** (v, w1, w2): ~30 distinct values from a small domain (dense
    * adjacency → many per-bucket collisions at nBuckets=8), weights with
    * heavy ties including zero. */
  private val histGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(30, for {
      v <- Gen.choose(-50L, 50L)
      w1 <- Gen.choose(0L, 5L)
      w2 <- Gen.choose(0L, 3L)
    } yield (v, w1, w2)).map(
      _.groupBy(_._1).map { case (v, g) =>
        (v, g.map(_._2).sum, g.map(_._3).sum)  // histogram: v unique
      }.toList)

  test("cumulative ≡ unpartitioned-window reference on 10 arbitrary weighted multisets") {
    (1 to 10).foreach { i =>
      val rows = histGen.sample.get
      val df = rows.toDF("v", "w1", "w2")
      val ref = df.withColumn("cum_w1",
          sum("w1").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_w2",
          sum("w2").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
      // nBuckets=8 on a ≤101-wide domain → multi-value buckets guaranteed
      val got = PrefixSum.cumulative(df, "v", Seq("w1", "w2"), nBuckets = 8)
        .select("v", "cum_w1", "cum_w2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == ref, s"cumulative divergence on case $i")
    }
  }

  test("partitioned cumulative ≡ per-group window reference") {
    val rows = for { g <- Seq("a", "b", "c"); v <- 0L to 40L }
      yield (g, v * 3 + g.hashCode.abs % 3, (v * 7 + g.length) % 5)
    val df = rows.toDF("g", "v", "w")
    val ref = df.withColumn("cum_w",
        sum("w").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val got = PrefixSum.cumulative(df, "v", Seq("w"), Seq("g"), nBuckets = 8)
      .select("g", "v", "cum_w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
  }

  test("caller-passed CONTAINING bounds change nothing; double order column works") {
    val rows = Seq((0.25, 2L), (1.5, 1L), (-3.75, 4L), (10.0, 1L), (9.875, 3L))
    val df = rows.toDF("v", "w")
    def run(b: Option[(Double, Double)]) =
      PrefixSum.cumulative(df, "v", Seq("w"), bounds = b, nBuckets = 4)
        .select("v", "cum_w")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    val expected = Set((-3.75, 4L), (0.25, 6L), (1.5, 7L), (9.875, 10L), (10.0, 11L))
    assert(run(None) == expected)
    assert(run(Some((-100.0, 100.0))) == expected)  // loose bounds: same output
  }

  test("empty input yields empty output (no null-bounds crash)") {
    val df = Seq.empty[(Long, Long)].toDF("v", "w")
    assert(PrefixSum.cumulative(df, "v", Seq("w")).count() == 0L)
    assert(PrefixSum.rank2(df, "v", "w").count() == 0L)
  }

  test("rank2 ≡ 2× scalar average rank on a tied multiset") {
    // values 10,20,20-equivalent histogram: (v=10,cnt=2),(v=20,cnt=3),(v=30,cnt=1)
    // expanded multiset ranks: 10→(1+2)/2=1.5, 20→(3+4+5)/3=4, 30→6
    val df = Seq((10L, 2L), (20L, 3L), (30L, 1L)).toDF("v", "cnt")
    val got = PrefixSum.rank2(df, "v", "cnt").select("v", "r2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 3L, 20L -> 8L, 30L -> 12L))
  }
}
