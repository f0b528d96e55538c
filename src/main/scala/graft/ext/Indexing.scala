package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global, contiguous row numbering at scale.
  *
  * The naive form — `row_number().over(Window.orderBy(...))` — collapses
  * the whole table into ONE partition (Spark warns exactly this) and is
  * the classic 100 TB killer: a single task sorts the world. The scalable
  * shape is sort-then-offset: range-shuffle into sorted partitions, count
  * rows per partition (one cheap job over the same shuffle output), and
  * add each partition's exclusive prefix offset to its local index.
  *
  * Implementation uses `RDD.zipWithIndex` — the one place this library
  * drops to the RDD API deliberately. The tempting pure-DataFrame twin
  * (per-`spark_partition_id` window + a broadcast offset join) computes
  * offsets and final indexes in TWO separate jobs, and AQE may coalesce
  * the exchange differently per job, silently mis-assigning offsets.
  * `zipWithIndex` runs its count job and map job over the SAME materialized
  * shuffle output, so the partition↔offset mapping cannot drift.
  */
object Indexing {

  /** Append a 0-based contiguous `global_idx` reflecting ascending
    * `orderCol` order. One range shuffle + one lightweight count job. */
  def globalIndex(df: DataFrame, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema.add("global_idx", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
