package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.etl.{Cleaners, CsvSink, Extract, RawSource, Transform}
import graft.etl.RawSource.OracleCleaners
import graft.model.Schemas

/** Reference-parity queries (SURVEY.md §2): each cleaner P1-P5, the F1/F2
  * filters, and the full transform pipeline, run over the deterministic
  * synthetic raw-products table ([[graft.etl.RawSource]]) so every semantic
  * of `/root/reference/utils/transform.py` is hash-checked against DuckDB.
  */
object EtlQueries {

  private def withRaw(sql: String): String =
    s"WITH raw AS (${RawSource.rawSql}) $sql"

  /** F1 predicate in DuckDB SQL (`/root/reference/utils/transform.py:19-23`). */
  private val dirtyFilterSql: String = Transform.DirtyPatterns.toSeq.sortBy(_._1)
    .map { case (c, pats) =>
      s"$c IS NOT NULL AND $c NOT IN (${pats.map(p => s"'$p'").mkString(", ")})"
    }.mkString(" AND ")

  private val cleanedSelectSql: String =
    s"""SELECT p_partkey, title,
       |  ${OracleCleaners.price("price")} AS price,
       |  ${OracleCleaners.rating("rating")} AS rating,
       |  ${OracleCleaners.colors("colors")} AS colors,
       |  ${OracleCleaners.size("size")} AS size,
       |  ${OracleCleaners.gender("gender")} AS gender,
       |  timestamp
       |FROM raw WHERE $dirtyFilterSql""".stripMargin

  val all: Map[String, Q] = Map(
    "etl_clean_price" -> Q(
      (s, dir) => RawSource.syntheticRaw(s, dir)
        .select(col("p_partkey"), col("price").as("price_raw"),
          Cleaners.cleanPrice(col("price")).as("price_clean"))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT p_partkey, price AS price_raw, " +
        s"${OracleCleaners.price("price")} AS price_clean FROM raw ORDER BY p_partkey")),
      "P1 clean_price (/root/reference/utils/transform.py:27-44)"),

    "etl_clean_rating" -> Q(
      (s, dir) => RawSource.syntheticRaw(s, dir)
        .select(col("p_partkey"), col("rating").as("rating_raw"),
          Cleaners.cleanRating(col("rating")).as("rating_clean"))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT p_partkey, rating AS rating_raw, " +
        s"${OracleCleaners.rating("rating")} AS rating_clean FROM raw ORDER BY p_partkey")),
      "P2 clean_rating (/root/reference/utils/transform.py:46-57)"),

    "etl_clean_colors" -> Q(
      (s, dir) => RawSource.syntheticRaw(s, dir)
        .select(col("p_partkey"), col("colors").as("colors_raw"),
          Cleaners.cleanColors(col("colors")).as("colors_clean"))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT p_partkey, colors AS colors_raw, " +
        s"${OracleCleaners.colors("colors")} AS colors_clean FROM raw ORDER BY p_partkey")),
      "P3 clean_colors (/root/reference/utils/transform.py:59-76)"),

    "etl_clean_size" -> Q(
      (s, dir) => RawSource.syntheticRaw(s, dir)
        .select(col("p_partkey"), col("size").as("size_raw"),
          Cleaners.cleanSize(col("size")).as("size_clean"))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT p_partkey, size AS size_raw, " +
        s"${OracleCleaners.size("size")} AS size_clean FROM raw ORDER BY p_partkey")),
      "P4 clean_size (/root/reference/utils/transform.py:78-91)"),

    "etl_clean_gender" -> Q(
      (s, dir) => RawSource.syntheticRaw(s, dir)
        .select(col("p_partkey"), col("gender").as("gender_raw"),
          Cleaners.cleanGender(col("gender")).as("gender_clean"))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT p_partkey, gender AS gender_raw, " +
        s"${OracleCleaners.gender("gender")} AS gender_clean FROM raw ORDER BY p_partkey")),
      "P5 clean_gender (/root/reference/utils/transform.py:93-106)"),

    "etl_dirty_filter" -> Q(
      (s, dir) => Transform.removeDirtyData(RawSource.syntheticRaw(s, dir))
        .select("p_partkey", "title", "price", "rating")
        .orderBy("p_partkey"),
      Some(withRaw("SELECT p_partkey, title, price, rating FROM raw " +
        s"WHERE $dirtyFilterSql ORDER BY p_partkey")),
      "F1 dirty-pattern anti-filter (/root/reference/utils/transform.py:108-121)"),

    "etl_pipeline" -> Q(
      (s, dir) => Transform.transform(RawSource.syntheticRaw(s, dir))
        .orderBy("p_partkey"),
      Some(withRaw(s"SELECT * FROM ($cleanedSelectSql) " +
        "WHERE price IS NOT NULL AND rating IS NOT NULL AND colors IS NOT NULL " +
        "AND size IS NOT NULL AND gender IS NOT NULL ORDER BY p_partkey")),
      "Full F1→P1-P6→F2 transform (/root/reference/utils/transform.py:123-174)"),

    // S3 end-to-end inside the harness: render each synthetic raw product as
    // an HTML product card (the fixture grammar of
    // /root/reference/tests/test_extract.py:14-24), run the distributed
    // flatMap parser, then the full transform. The parser round-trips the
    // synthesized fields, so the oracle derives the same output in pure SQL.
    "etl_extract_parse" -> Q(
      (s, dir) => {
        import s.implicits._
        val pages = RawSource.syntheticRaw(s, dir)
          .select(concat(
            lit("""<html><body><div class="product-card"><h3 class="product-title">P"""),
            lpad(col("p_partkey").cast("string"), 8, "0"),
            lit("""</h3><span class="price">"""), col("price"),
            lit("</span><p>Rating: "), col("rating"),
            lit("</p><p>"), col("colors"),
            lit("</p><p>"), col("size"),
            lit("</p><p>"), col("gender"),
            lit("</p></div></body></html>")).as("html"))
          .as[String]
        Transform.transform(Extract.extract(pages, "2025-05-17T14:36:09.466889"))
          .orderBy("title")
      },
      Some(withRaw(
        s"""SELECT * FROM (
           |  SELECT 'P' || lpad(p_partkey::VARCHAR, 8, '0') AS title,
           |    ${OracleCleaners.price("price")} AS price,
           |    ${OracleCleaners.rating("rating")} AS rating,
           |    ${OracleCleaners.colors("colors")} AS colors,
           |    ${OracleCleaners.size("size")} AS size,
           |    ${OracleCleaners.gender("gender")} AS gender,
           |    timestamp
           |  FROM raw
           |  WHERE price IS NOT NULL AND price NOT IN ('Price Unavailable', 'N/A', '')
           |    AND rating IS NOT NULL AND rating NOT IN ('Invalid Rating / 5', 'Not Rated', 'N/A', '')
           |) WHERE price IS NOT NULL AND rating IS NOT NULL AND colors IS NOT NULL
           |  AND size IS NOT NULL AND gender IS NOT NULL
           |ORDER BY title""".stripMargin)),
      "S3 HTML-card extraction, distributed flatMap (/root/reference/utils/extract.py:35-87)"),

    // K1+S6 inside the harness: clean output → partition-parallel CSV write
    // → schema'd read-back. Doubles round-trip exactly (shortest-repr write,
    // exact parse), so the oracle is the same SQL as etl_pipeline.
    "etl_csv_roundtrip" -> Q(
      (s, dir) => {
        val out = Artifacts.scratch("graft_csv") + "/out"
        CsvSink(out).write(Transform.transform(RawSource.syntheticRaw(s, dir)))
        val schema = StructType(StructField("p_partkey", LongType) +: Schemas.clean.fields)
        s.read.option("header", "true").schema(schema).csv(out).orderBy("p_partkey")
      },
      Some(withRaw(s"SELECT * FROM ($cleanedSelectSql) " +
        "WHERE price IS NOT NULL AND rating IS NOT NULL AND colors IS NOT NULL " +
        "AND size IS NOT NULL AND gender IS NOT NULL ORDER BY p_partkey")),
      "K1 CSV sink + S6 read-back roundtrip (/root/reference/utils/load.py:37-73, tests/test_load.py:38-43)"),

    // JSON source/sink twin of the CSV roundtrip: line-delimited JSON
    // write → schema'd read. Doubles survive via shortest-repr.
    "etl_json_roundtrip" -> Q(
      (s, dir) => {
        val out = Artifacts.scratch("graft_json") + "/out"
        Transform.transform(RawSource.syntheticRaw(s, dir))
          .write.mode("overwrite").json(out)
        val schema = StructType(StructField("p_partkey", LongType) +: Schemas.clean.fields)
        s.read.schema(schema).json(out).orderBy("p_partkey")
      },
      Some(withRaw(s"SELECT * FROM ($cleanedSelectSql) " +
        "WHERE price IS NOT NULL AND rating IS NOT NULL AND colors IS NOT NULL " +
        "AND size IS NOT NULL AND gender IS NOT NULL ORDER BY p_partkey")),
      "JSON sink + schema'd read-back roundtrip"),

    // ORC source/sink twin of the CSV/JSON roundtrips — the third columnar
    // format Spark serves natively (same oracle as etl_pipeline: the
    // roundtrip must be lossless). Doubles survive exactly: ORC stores
    // IEEE754 natively, no text repr involved.
    "etl_orc_roundtrip" -> Q(
      (s, dir) => {
        val out = Artifacts.scratch("graft_orc") + "/out"
        Transform.transform(RawSource.syntheticRaw(s, dir))
          .write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy("p_partkey")
      },
      Some(withRaw(s"SELECT * FROM ($cleanedSelectSql) " +
        "WHERE price IS NOT NULL AND rating IS NOT NULL AND colors IS NOT NULL " +
        "AND size IS NOT NULL AND gender IS NOT NULL ORDER BY p_partkey")),
      "ORC sink + read-back roundtrip (native IEEE754, schema carried by the file)"),

    // S2 page-URL generator as a parallelizable range scan
    // (/root/reference/utils/extract.py:99-100 is a serial loop).
    "etl_page_urls" -> Q(
      (s, _) => graft.etl.Extract.pageUrls(s).orderBy("page"),
      Some("""SELECT range AS page,
             |  CASE WHEN range = 1 THEN 'https://fashion-studio.dicoding.dev'
             |       ELSE 'https://fashion-studio.dicoding.dev/page' || range END AS url
             |FROM range(1, 51) ORDER BY page""".stripMargin),
      "S2 page-URL enumeration (range scan, not a serial loop)"),

    // The five cleaners through the SQL front end (registered as SQL
    // functions by GraftExtensions) — same oracle math as etl_clean_*.
    "sql_cleaners" -> Q(
      (s, dir) => {
        graft.plans.GraftExtensions.register(s)
        RawSource.syntheticRaw(s, dir).createOrReplaceTempView("raw_products")
        s.sql("""SELECT p_partkey,
                |  clean_price(price) AS price_clean,
                |  clean_rating(rating) AS rating_clean,
                |  clean_colors(colors) AS colors_clean,
                |  clean_size(size) AS size_clean,
                |  clean_gender(gender) AS gender_clean
                |FROM raw_products ORDER BY p_partkey""".stripMargin)
      },
      Some(withRaw(
        s"""SELECT p_partkey,
           |  ${OracleCleaners.price("price")} AS price_clean,
           |  ${OracleCleaners.rating("rating")} AS rating_clean,
           |  ${OracleCleaners.colors("colors")} AS colors_clean,
           |  ${OracleCleaners.size("size")} AS size_clean,
           |  ${OracleCleaners.gender("gender")} AS gender_clean
           |FROM raw ORDER BY p_partkey""".stripMargin)),
      "P1-P5 registered as SQL functions (FunctionRegistry seam)"),

    // S1 at-scale design: the scrape stage as a DataSource V2 TableProvider
    // whose input partitions executors read independently (SURVEY §2.1).
    // numRows follows the sf's part count; the oracle SQL tracks the same
    // scale via OracleAux.oracleScaleRows (2000 at the driver's sf0.01
    // gate — unchanged there — 20000 under the sf0.1 portability sweep).
    "source_dsv2_scrape" -> Q(
      (s, dir) => {
        val n = Registry.table(s, dir, "part").count()
        s.read.format("graft.sources.ScrapeSource")
          .option("numRows", n).option("numPartitions", 4).load()
          .orderBy("p_partkey")
      },
      Some(graft.sources.ScrapeSource.rangeSql(
        OracleAux.oracleScaleRows(2000)) + " ORDER BY p_partkey"),
      "custom DataSource V2 batch source (partitioned scrape generator)")
  )
}
