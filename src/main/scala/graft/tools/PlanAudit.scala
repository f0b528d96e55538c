package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side plan audit: print the physical plan of any registered
  * query by name (PERF.md methodology — "explain, then iterate until it's
  * the plan you'd want"). Usage:
  *
  *   sbt "runMain graft.tools.PlanAudit graph_pagerank text_bm25"
  *
  * Optional env SPARK_GRAFT_SF_DIR overrides the sf directory (plans are
  * audited at sf0.01 by default; AQE finalizes some shapes only at run
  * time, so treat this as the static shape check). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
