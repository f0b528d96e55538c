package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-registered query: a Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the driver
  * hash-compares against (see `graft.Verify`). Queries without an oracle get
  * the driver's weaker rows-only check.
  *
  * Determinism contract (SURVEY.md §7.4): every compared query fully
  * `ORDER BY`s its output, rounds floating aggregates, and never emits
  * wall-clock values.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** Read one harness table (TESTDATA.md). `events.parquet` carries a
    * TIMESTAMP(NANOS) column that Spark's parquet reader rejects unless
    * nanos are surfaced as longs, so that conf is forced here (runtime-set:
    * it is read at scan planning). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` normalized from nanos-as-long to a microsecond
    * timestamp — the same truncation DuckDB applies when it reads
    * nanosecond parquet into its µs TIMESTAMP, so oracle comparisons agree. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
