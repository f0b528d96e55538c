package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-shaped upsert: apply a key'd update stream to a base table with
  * last-write-wins semantics. The reference pipeline overwrites whole
  * sinks (`/root/reference/utils/load.py` always replaces); this is the
  * incremental form a 100 TB deployment needs — only the changed keys
  * move.
  *
  * Scale shape: [[latestPerKey]] is ONE shuffle keyed on the update key
  * (rank-1 window = CDC log compaction); the merge join shuffles on the
  * same key, so the exchange is reused, and when the compacted update set
  * is dim-sized Catalyst/AQE broadcasts it. At production scale the final
  * write lands via an ACID table format's MERGE (Iceberg/Delta); the
  * parquet-rewrite used by the streaming test harness
  * ([[graft.streaming.StreamingOps.upsertStream]]) is the offline
  * stand-in with identical merge semantics.
  */
object Upsert {

  /** Latest update per key: rank-1 `row_number` under `orderCols`
    * (DESC-first, with a unique tiebreaker column last for determinism).
    * This is CDC log compaction — O(updates) with one key shuffle,
    * independent of base-table size. */
  def latestPerKey(updates: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full-outer last-write-wins merge: keys present in `updates` carry the
    * latest update payload (UPDATE, or INSERT when absent from `base`);
    * keys only in `base` pass through unchanged. The USING-style key join
    * coalesces the key columns, so callers see one key column regardless
    * of which side matched. */
  def merge(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    base.join(latestPerKey(updates, keyCols, orderCols), keyCols, "full_outer")
}
