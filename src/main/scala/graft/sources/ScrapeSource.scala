package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` for the raw scrape table — the at-scale
  * source design SURVEY.md §2.1 S1 calls for: where the reference fetches
  * 50 pages serially on one machine (`/root/reference/utils/extract.py:99`,
  * 1.5 s sleep each), a DSv2 source splits the page space into
  * `numPartitions` input partitions that executors read independently.
  * The "fetch" here deterministically synthesizes the same dirty raw
  * product rows as [[graft.etl.RawSource]] (title base differs: no
  * part.parquet dependency — `part-<pk>`), so the harness can
  * hash-compare it against a pure SQL `range()` oracle.
  *
  * Usage: `spark.read.format("graft.sources.ScrapeSource")
  *   .option("numRows", n).option("numPartitions", p).load()`
  */
class ScrapeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ScrapeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by contract; .option("numrows", n)
    // must not silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new ScrapeTable(
      opts.getLong("numRows", 2000L),
      opts.getInt("numPartitions", 4))
  }
}

object ScrapeSource {
  val schema: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("price", StringType, nullable = false),
    StructField("rating", StringType, nullable = false),
    StructField("colors", StringType, nullable = false),
    StructField("size", StringType, nullable = false),
    StructField("gender", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false)))

  /** Row synthesis — the integer-derived twin of [[graft.etl.RawSource]]
    * (same dirty sentinels and price-branch mix) with `part-<pk>` titles. */
  def row(pk: Long): Seq[String] = {
    def cents = f"${pk % 100}%02d"
    val title =
      if (pk % 13 == 0) "Unknown Product"
      else if (pk % 17 == 0) "N/A"
      else if (pk % 37 == 0) ""
      else s"part-$pk"
    val price =
      if (pk % 11 == 0) "Price Unavailable"
      else if (pk % 19 == 0) "N/A"
      else if (pk % 7 == 0) s"${pk % 900 + 100},$cents"
      else if (pk % 5 == 0) s"$$1,${pk % 900 + 100}.$cents"
      else s"$$${pk % 900 + 100}.$cents"
    val rating =
      if (pk % 23 == 0) "Not Rated"
      else if (pk % 29 == 0) "Invalid Rating / 5"
      else s"⭐ ${pk % 2 + 3}.${pk % 10} / 5"
    val colors =
      if (pk % 31 == 0) "Unknown Colors" else s"${pk % 5 + 1} Colors"
    val size = "Size: " + Seq("S", "M", "L", "XL", "XXL")((pk % 5).toInt)
    val gender = "Gender: " + Seq("Men", "Women", "Unisex")((pk % 3).toInt)
    Seq(title, price, rating, colors, size, gender, "2025-05-17T14:36:09.466889")
  }

  /** The byte-identical synthesis in DuckDB SQL over `range(1, n+1)`. */
  def rangeSql(numRows: Long): String =
    s"""SELECT pk AS p_partkey,
       |  CASE WHEN pk % 13 = 0 THEN 'Unknown Product'
       |       WHEN pk % 17 = 0 THEN 'N/A'
       |       WHEN pk % 37 = 0 THEN ''
       |       ELSE 'part-' || pk END AS title,
       |  CASE WHEN pk % 11 = 0 THEN 'Price Unavailable'
       |       WHEN pk % 19 = 0 THEN 'N/A'
       |       WHEN pk % 7 = 0 THEN (pk % 900 + 100)::VARCHAR || ',' || lpad((pk % 100)::VARCHAR, 2, '0')
       |       WHEN pk % 5 = 0 THEN '$$1,' || (pk % 900 + 100)::VARCHAR || '.' || lpad((pk % 100)::VARCHAR, 2, '0')
       |       ELSE '$$' || (pk % 900 + 100)::VARCHAR || '.' || lpad((pk % 100)::VARCHAR, 2, '0') END AS price,
       |  CASE WHEN pk % 23 = 0 THEN 'Not Rated'
       |       WHEN pk % 29 = 0 THEN 'Invalid Rating / 5'
       |       ELSE '⭐ ' || (pk % 2 + 3)::VARCHAR || '.' || (pk % 10)::VARCHAR || ' / 5' END AS rating,
       |  CASE WHEN pk % 31 = 0 THEN 'Unknown Colors'
       |       ELSE (pk % 5 + 1)::VARCHAR || ' Colors' END AS colors,
       |  'Size: ' || CASE (pk % 5) WHEN 0 THEN 'S' WHEN 1 THEN 'M' WHEN 2 THEN 'L' WHEN 3 THEN 'XL' ELSE 'XXL' END AS size,
       |  'Gender: ' || CASE (pk % 3) WHEN 0 THEN 'Men' WHEN 1 THEN 'Women' ELSE 'Unisex' END AS gender,
       |  '2025-05-17T14:36:09.466889' AS timestamp
       |FROM range(1, ${numRows + 1}) t(pk)""".stripMargin
}

class ScrapeTable(numRows: Long, numPartitions: Int) extends Table with SupportsRead {
  override def name(): String = s"scrape($numRows rows)"
  override def schema(): StructType = ScrapeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = ScrapeSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // balanced split covering exactly [1, numRows] — no phantom rows
        // when numRows < numPartitions (empty ranges emit nothing)
        val parts = math.max(1, numPartitions)
        (0 until parts).map { i =>
          val start = numRows * i / parts + 1
          val end = numRows * (i + 1) / parts + 1
          ScrapeRange(start, end): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val ScrapeRange(start, end) = partition
          new PartitionReader[InternalRow] {
            private var pk = start - 1
            override def next(): Boolean = { pk += 1; pk < end }
            override def get(): InternalRow = InternalRow.fromSeq(
              pk +: ScrapeSource.row(pk).map(UTF8String.fromString))
            override def close(): Unit = ()
          }
        }
    }
}

case class ScrapeRange(start: Long, end: Long) extends InputPartition
