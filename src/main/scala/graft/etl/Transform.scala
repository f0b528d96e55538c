package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The reference's transform stage (`/root/reference/utils/transform.py:123-174`)
  * as a lazy `Filter → Project → Filter` logical plan. Catalyst collapses the
  * stages, pushes the F1 `In`/`IsNotNull` predicates into the scan, and
  * whole-stage-codegen fuses everything into one generated loop — zero
  * shuffles, so this pipeline scales linearly with partitions (100 TB = more
  * partitions, same plan).
  */
object Transform {

  /** Dirty-value lists per column (`/root/reference/utils/transform.py:19-23`). */
  val DirtyPatterns: Map[String, Seq[String]] = Map(
    "title" -> Seq("Unknown Product", "N/A", ""),
    "rating" -> Seq("Invalid Rating / 5", "Not Rated", "N/A", ""),
    "price" -> Seq("Price Unavailable", "N/A", "")
  )

  /** F1 — dirty-pattern anti-filter (`/root/reference/utils/transform.py:108-121`):
    * for each of title/rating/price *present in the schema*, drop rows whose
    * value is in the dirty list or is null. Columns filter independently and
    * conjunctively. Pure Catalyst `In` + `IsNotNull` — pushdown-eligible.
    */
  def removeDirtyData(df: DataFrame): DataFrame =
    DirtyPatterns.toSeq.sortBy(_._1).foldLeft(df) { case (d, (column, dirty)) =>
      if (d.columns.contains(column))
        d.filter(col(column).isNotNull && !col(column).isin(dirty: _*))
      else d
    }

  /** P6 — the five cleaners overwrite their columns in place
    * (`/root/reference/utils/transform.py:145-157`); title/timestamp pass
    * through. One single `Project` node.
    */
  def cleanColumns(df: DataFrame): DataFrame =
    df.withColumns(Map(
      "price" -> Cleaners.cleanPrice(col("price")),
      "rating" -> Cleaners.cleanRating(col("rating")),
      "colors" -> Cleaners.cleanColors(col("colors")),
      "size" -> Cleaners.cleanSize(col("size")),
      "gender" -> Cleaners.cleanGender(col("gender"))
    ))

  /** F2 — null-drop over the 5 cleaned columns
    * (`/root/reference/utils/transform.py:160-162`). */
  def dropNullRows(df: DataFrame): DataFrame =
    df.na.drop("any", Schemas.dropnaSubset)

  /** Full transform: F1 → P1-P6 → F2.
    *
    * The reference returns an EMPTY frame when an expected column is missing
    * (`utils/transform.py:145-157` raises inside the blanket except at
    * `:170-174`; pinned by `tests/test_transform.py:113-116`). We reproduce
    * that surface via an explicit schema check instead of exception
    * swallowing (SURVEY.md §3.3).
    */
  def transform(df: DataFrame): DataFrame = {
    val required = Schemas.raw.fieldNames.toSet - "timestamp" - "title"
    if (!required.subsetOf(df.columns.toSet))
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.clean)
    else dropNullRows(cleanColumns(removeDirtyData(df)))
  }
}
