package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic synthetic "scraped products" table, derived from
  * `part.parquet` (FIXTURES.md §5: cleaner-parity queries synthesize dirty
  * strings from harness tables). All strings are built from INTEGER
  * arithmetic on `p_partkey` — never from float formatting — so the DuckDB
  * oracle (`rawSql`) produces byte-identical raw values.
  *
  * The dirty-value mix mirrors the reference's observed input distribution
  * (`/root/reference/products.csv` ≈ 13% dirty rows; SURVEY.md §6): titles,
  * prices and ratings each carry the exact dirty sentinels of
  * `/root/reference/utils/transform.py:19-23`, price strings exercise all
  * three `clean_price` branches (plain `$d.dd`, comma-decimal `d,dd`,
  * thousands `1,ddd.dd` — `utils/transform.py:36-41`).
  */
object RawSource {

  /** Spark side. Keeps `p_partkey` as a pass-through id for deterministic
    * ordering in oracle-compared outputs. */
  def syntheticRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = col("p_partkey")
    def s(c: org.apache.spark.sql.Column) = c.cast(StringType)
    val cents = lpad(s(pk % 100), 2, "0")
    spark.read.parquet(s"$sfDir/part.parquet")
      .select(
        pk,
        when(pk % 13 === 0, "Unknown Product")
          .when(pk % 17 === 0, "N/A")
          .when(pk % 37 === 0, "")
          .otherwise(col("p_name")).as("title"),
        when(pk % 11 === 0, "Price Unavailable")
          .when(pk % 19 === 0, "N/A")
          .when(pk % 7 === 0, concat(s(pk % 900 + 100), lit(","), cents))
          .when(pk % 5 === 0, concat(lit("$1,"), lpad(s(pk % 900 + 100), 3, "0"), lit("."), cents))
          .otherwise(concat(lit("$"), s(pk % 900 + 100), lit("."), cents)).as("price"),
        when(pk % 23 === 0, "Not Rated")
          .when(pk % 29 === 0, "Invalid Rating / 5")
          .otherwise(concat(lit("⭐ "), s(pk % 2 + 3), lit("."), s(pk % 10), lit(" / 5"))).as("rating"),
        when(pk % 31 === 0, "Unknown Colors")
          .otherwise(concat(s(pk % 5 + 1), lit(" Colors"))).as("colors"),
        concat(lit("Size: "),
          element_at(array(lit("S"), lit("M"), lit("L"), lit("XL"), lit("XXL")), (pk % 5 + 1).cast("int"))).as("size"),
        concat(lit("Gender: "),
          element_at(array(lit("Men"), lit("Women"), lit("Unisex")), (pk % 3 + 1).cast("int"))).as("gender"),
        lit("2025-05-17T14:36:09.466889").as("timestamp"))
  }

  /** The byte-identical synthesis in DuckDB SQL, as a CTE body named `raw`.
    * Every oracle query over the synthetic products embeds this. */
  val rawSql: String =
    """SELECT p_partkey,
      |  CASE WHEN p_partkey % 13 = 0 THEN 'Unknown Product'
      |       WHEN p_partkey % 17 = 0 THEN 'N/A'
      |       WHEN p_partkey % 37 = 0 THEN ''
      |       ELSE p_name END AS title,
      |  CASE WHEN p_partkey % 11 = 0 THEN 'Price Unavailable'
      |       WHEN p_partkey % 19 = 0 THEN 'N/A'
      |       WHEN p_partkey % 7 = 0 THEN (p_partkey % 900 + 100)::VARCHAR || ',' || lpad((p_partkey % 100)::VARCHAR, 2, '0')
      |       WHEN p_partkey % 5 = 0 THEN '$1,' || lpad((p_partkey % 900 + 100)::VARCHAR, 3, '0') || '.' || lpad((p_partkey % 100)::VARCHAR, 2, '0')
      |       ELSE '$' || (p_partkey % 900 + 100)::VARCHAR || '.' || lpad((p_partkey % 100)::VARCHAR, 2, '0') END AS price,
      |  CASE WHEN p_partkey % 23 = 0 THEN 'Not Rated'
      |       WHEN p_partkey % 29 = 0 THEN 'Invalid Rating / 5'
      |       ELSE '⭐ ' || (p_partkey % 2 + 3)::VARCHAR || '.' || (p_partkey % 10)::VARCHAR || ' / 5' END AS rating,
      |  CASE WHEN p_partkey % 31 = 0 THEN 'Unknown Colors'
      |       ELSE (p_partkey % 5 + 1)::VARCHAR || ' Colors' END AS colors,
      |  'Size: ' || CASE (p_partkey % 5 + 1) WHEN 1 THEN 'S' WHEN 2 THEN 'M' WHEN 3 THEN 'L' WHEN 4 THEN 'XL' ELSE 'XXL' END AS size,
      |  'Gender: ' || CASE (p_partkey % 3 + 1) WHEN 1 THEN 'Men' WHEN 2 THEN 'Women' ELSE 'Unisex' END AS gender,
      |  '2025-05-17T14:36:09.466889' AS timestamp
      |FROM part""".stripMargin

  /** DuckDB equivalents of the five cleaners (ANSI-safe, TRY_CAST), applied
    * to a column expression. Mirror of [[Cleaners]]. */
  object OracleCleaners {
    def price(c: String): String = {
      val stripped = s"regexp_replace($c, '[^0-9.,]', '', 'g')"
      val commaFix = s"CASE WHEN contains($stripped, ',') AND NOT contains($stripped, '.') " +
        s"THEN replace($stripped, ',', '.') ELSE $stripped END"
      val noThousands = s"replace($commaFix, ',', '')"
      s"CASE WHEN $c IS NULL OR trim($c) = '' THEN NULL " +
        s"ELSE TRY_CAST($noThousands AS DOUBLE) * 16000.0 END"
    }
    def rating(c: String): String =
      s"TRY_CAST(nullif(regexp_extract($c, '(\\d+(?:\\.\\d+)?)', 1), '') AS DOUBLE)"
    def colors(c: String): String =
      s"CASE WHEN $c IS NULL OR $c = '' OR $c = 'Unknown Colors' THEN NULL " +
        s"ELSE TRY_CAST(nullif(regexp_extract($c, '(\\d+)', 1), '') AS INTEGER) END"
    def size(c: String): String =
      s"nullif(trim(regexp_replace($c, '(?i)^Size:\\s*', '')), '')"
    def gender(c: String): String =
      s"nullif(trim(regexp_replace($c, '(?i)^Gender:\\s*', '')), '')"
  }
}
