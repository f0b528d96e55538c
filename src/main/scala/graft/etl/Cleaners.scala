package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** The five scalar cleaners of the reference, re-expressed as pure Catalyst
  * `Column` expressions (SURVEY.md §2.3). No UDFs anywhere: every cleaner
  * compiles into built-in expressions so the whole clean stage fuses into a
  * single whole-stage-codegen loop — the reference instead runs one Python
  * interpreter call per value (`/root/reference/utils/transform.py:145-157`).
  *
  * All expressions are ANSI-safe (`try_cast`, never `cast`, for
  * string→number) so behavior is identical whether `spark.sql.ansi.enabled`
  * is true (Spark 4 default) or false.
  *
  * Regexes stay inside the Java/RE2/Python-`re` common subset so the same
  * pattern means the same thing in Spark, DuckDB (oracle) and the reference
  * (SURVEY.md §2.7).
  */
object Cleaners {

  /** USD→IDR conversion applied by the reference
    * (`/root/reference/utils/transform.py:25`). */
  val CurrencyConversion: Double = 16000.0

  /** P1 `clean_price` (`/root/reference/utils/transform.py:27-44`):
    * null/blank → null; strip every char not in `[0-9.,]`; a `,` with no `.`
    * is a decimal point; remaining `,` are thousands separators; parse float
    * (unparseable → null); × 16000.
    * `"$99.99"`→1599840.0, `"100,50"`→1608000.0, `"1,000.50"`→16008000.0.
    */
  def cleanPrice(c: Column): Column = {
    val stripped = regexp_replace(c, "[^0-9.,]", "")
    val commaAsDecimal = when(
      stripped.contains(",") && !stripped.contains("."),
      regexp_replace(stripped, ",", ".")
    ).otherwise(stripped)
    val noThousands = regexp_replace(commaAsDecimal, ",", "")
    val parsed = noThousands.try_cast(DoubleType) * lit(CurrencyConversion)
    when(c.isNull || trim(c) === "", lit(null).cast(DoubleType)).otherwise(parsed)
  }

  /** P2 `clean_rating` (`/root/reference/utils/transform.py:46-57`): first
    * `\d+(\.\d+)?` anywhere → double; none/blank/null → null.
    * Spark's `regexp_extract` returns `""` on no-match, hence the `nullif`.
    */
  def cleanRating(c: Column): Column =
    nullif(regexp_extract(c, "(\\d+(?:\\.\\d+)?)", 1), lit("")).try_cast(DoubleType)

  /** P3 `clean_colors` (`/root/reference/utils/transform.py:59-76`): falsy
    * (null/`""`) or exact `"Unknown Colors"` → null; else first `\d+` → int.
    */
  def cleanColors(c: Column): Column =
    when(c.isNull || c === "" || c === "Unknown Colors", lit(null).cast(IntegerType))
      .otherwise(nullif(regexp_extract(c, "(\\d+)", 1), lit("")).try_cast(IntegerType))

  /** P4 `clean_size` (`/root/reference/utils/transform.py:78-91`): strip a
    * leading case-insensitive `Size:` prefix, trim; blank result → null.
    */
  def cleanSize(c: Column): Column =
    nullif(trim(regexp_replace(c, "(?i)^Size:\\s*", "")), lit(""))

  /** P5 `clean_gender` (`/root/reference/utils/transform.py:93-106`):
    * identical to P4 with prefix `Gender:`.
    */
  def cleanGender(c: Column): Column =
    nullif(trim(regexp_replace(c, "(?i)^Gender:\\s*", "")), lit(""))
}
