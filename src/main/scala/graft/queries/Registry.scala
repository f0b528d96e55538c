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
  /** Read one harness table (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
