package graft.model

import org.apache.spark.sql.types._

/** Row models for the two pipeline stages (SURVEY.md §1.3).
  *
  * The reference pipeline (`/root/reference/utils/extract.py:76-84`) emits 7
  * string columns; after cleaning (`/root/reference/utils/transform.py:123-174`)
  * five of them are typed and non-null. `timestamp` deliberately stays a
  * string — the reference never parses it (SURVEY.md §1.3).
  */
final case class RawProduct(
    title: String,
    price: String,
    rating: String,
    colors: String,
    size: String,
    gender: String,
    timestamp: String)

final case class Product(
    title: String,
    price: Double,
    rating: Double,
    colors: Int,
    size: String,
    gender: String,
    timestamp: String)

object Schemas {
  /** Raw stage: 7 nullable strings (`/root/reference/utils/extract.py:76-84`). */
  val raw: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("price", StringType),
    StructField("rating", StringType),
    StructField("colors", StringType),
    StructField("size", StringType),
    StructField("gender", StringType),
    StructField("timestamp", StringType)))

  /** Clean stage, as pinned by `/root/reference/products.csv:1` and
    * `/root/reference/tests/test_transform.py:85-106`. The 5 key columns are
    * non-null after the `na.drop` (`utils/transform.py:160-162`) but we keep
    * them declared nullable: Spark does not re-derive nullability through a
    * filter, and the values are what the oracle compares.
    */
  val clean: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("price", DoubleType),
    StructField("rating", DoubleType),
    StructField("colors", IntegerType),
    StructField("size", StringType),
    StructField("gender", StringType),
    StructField("timestamp", StringType)))

  /** Columns that must be non-null post-clean (`utils/transform.py:160-162`). */
  val dropnaSubset: Seq[String] = Seq("price", "rating", "colors", "size", "gender")
}
