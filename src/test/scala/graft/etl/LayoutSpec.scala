package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Physical-layout readiness for scale: bucketed co-located joins (no
  * shuffle) and partition-pruned scans — the layouts a 100 TB deployment
  * relies on, exercised end-to-end against the real planner. */
class LayoutSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_layout").toString

  test("bucketed tables join without any shuffle exchange") {
    val dir = sf("sf0.001")
    table(spark, dir, "orders").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/orders_b").format("parquet").saveAsTable("orders_b")
    table(spark, dir, "customer").write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/customer_b").format("parquet").saveAsTable("customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // neither join key may be re-shuffled (the only allowed exchange is
      // the post-join aggregation on c_mktsegment)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle on the join keys:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must be bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned parquet scans prune partitions from the pushed filter") {
    val dir = sf("sf0.001")
    table(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(s"$tmp/orders_p")
    val pruned = spark.read.parquet(s"$tmp/orders_p").filter(col("yr") === 1996)
    val explain = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(explain.contains("PartitionFilters"), explain)
    assert(explain.matches("(?s).*PartitionFilters: \\[[^\\]]*\\(yr#\\d+ = 1996\\)[^\\]]*\\].*"),
      s"partition filter not pushed:\n$explain")
    val all = spark.read.parquet(s"$tmp/orders_p")
    assert(pruned.count() > 0 && pruned.count() < all.count())
  }
}
