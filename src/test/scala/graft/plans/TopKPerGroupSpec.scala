package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** The custom top-k plan node must agree exactly with the window-function
  * formulation, and its physical plan must be heap-based (no sort). */
class TopKPerGroupSpec extends SparkSpec {

  test("custom operator == row_number window formulation") {
    val orders = table(spark, sf("sf0.001"), "orders")
    val native = TopKPerGroup(orders, 3, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)))
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
      .collect().toSeq
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
      .collect().toSeq
    assert(native == windowed)
    assert(native.nonEmpty)
  }

  test("physical plan is the custom exec with one exchange and no sort before it") {
    val orders = table(spark, sf("sf0.001"), "orders")
    val df = TopKPerGroup(orders, 3, Seq("o_custkey"), Seq(("o_totalprice", false)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("Sort "), s"no sort may feed the heap operator:\n$plan")
  }

  test("optimizer rule rewrites row_number+filter windows into the heap node") {
    val orders = table(spark, sf("sf0.001"), "orders")
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    def windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
    val baseline = windowed.collect().toSeq
    TopKRewriteRule.enable(spark)
    try {
      val rewritten = windowed
      val got = rewritten.collect().toSeq
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rule did not fire:\n$plan")
      assert(!plan.contains("Window [") && !plan.contains("WindowGroupLimit"),
        s"window machinery must be fully replaced:\n$plan")
      assert(got == baseline)
    } finally TopKRewriteRule.disable(spark)
    // and other window shapes are untouched
    TopKRewriteRule.enable(spark)
    try {
      val lagPlan = orders
        .withColumn("prev", lag("o_totalprice", 1).over(w))
        .filter(col("prev").isNotNull)
      lagPlan.collect()
      assert(!lagPlan.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally TopKRewriteRule.disable(spark)
  }

  test("rule guards: global top-k (no partition) and k<=0 keep the window plan") {
    val orders = table(spark, sf("sf0.001"), "orders")
    TopKRewriteRule.enable(spark)
    try {
      // empty PARTITION BY — ClusteredDistribution(Nil) would crash planning
      val global = Window.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      val g = orders.withColumn("rn", row_number().over(global)).filter(col("rn") <= 5)
      assert(g.count() == 5)
      assert(!g.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      // k = 0 — the heap exec would call head on an empty queue
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      val zero = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 0)
      assert(zero.count() == 0)
      assert(!zero.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally TopKRewriteRule.disable(spark)
  }

  test("group count above the heap bound falls back to the spill sort path, same result") {
    val orders = table(spark, sf("sf0.001"), "orders")
    // o_orderkey is ~unique → group count ≫ rows-per-group: with the heap
    // map bounded at 8 groups per partition, every partition must overflow
    // into the external-sort path
    def topk = TopKPerGroup(orders, 2, Seq("o_orderkey"), Seq(("o_totalprice", false)))
      .select("o_orderkey", "rn", "o_totalprice")
      .orderBy("o_orderkey", "rn")
    val heapResult = topk.collect().toSeq
    spark.conf.set("spark.graft.topk.maxGroupsInMemory", "8")
    try {
      val sortResult = topk.collect().toSeq
      assert(sortResult == heapResult)
      assert(sortResult.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.maxGroupsInMemory")
  }

  test("k larger than group size emits whole groups, ranks dense from 1") {
    val orders = table(spark, sf("sf0.001"), "orders")
    val df = TopKPerGroup(orders, 1000000, Seq("o_custkey"), Seq(("o_orderkey", true)))
    assert(df.count() == orders.count())
    val ranks = df.groupBy("o_custkey").agg(max("rn").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n")).count()
    assert(ranks == 0, "rank must be dense 1..n within each group")
  }
}
