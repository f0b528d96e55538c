package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — the
  * Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 97(5), 2006):
  * each item draws key = −ln(u)/w from a uniform u and weight w, and the
  * k SMALLEST keys form an exact weighted sample without replacement.
  * The corpus-curation use: pick a quality-weighted subset for a mixture
  * or an eval slice, reproducibly — so u comes from a seed-salted md5 of
  * the doc id (the same stable-key discipline as [[Shards]] and
  * `corpus_split`; never `rand()`), making the "sample" a pure function
  * of (corpus, seed) that engines and reruns agree on.
  *
  * Scale shape: one narrow map derives (u, w, key) per row; selection is
  * a TakeOrdered top-k (per-partition heaps, k-row merge) — no global
  * sort, no shuffle beyond the k-row collect. Weights are the 6-dp
  * quality score (+0.05 floor so zero-quality docs keep a finite key).
  */
object Sampling {

  /** Uniform-in-(0,1) from the first 6 hex digits of a seed-salted md5 —
    * one codegen'd base-16 conv ([[Shards.hexPrefixVal]]); the DuckDB
    * twin keeps its per-digit instr arithmetic (no hex→int cast exists
    * there) — same digits, same value. */
  private def hexU(h: Column): Column =
    (Shards.hexPrefixVal(h, 6).cast("double") + lit(0.5)) / lit(16777216.0)

  /** The k-doc quality-weighted sample: (doc_id, quality, wkey) ordered
    * by selection key. */
  def weightedSample(docs: DataFrame, k: Int, seed: String = "#wrs42"): DataFrame =
    docs
      // a null text has no quality weight and must not ride a null sort
      // key into the sample (Spark sorts nulls first, DuckDB last — the
      // filter removes the divergence along with the meaningless row)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextStats.qualityScore(col("text")).as("quality"))
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(seed))))
      .withColumn("wkey", round(-log(hexU(col("h"))) / (col("quality") + lit(0.05)), 6))
      .select("doc_id", "quality", "wkey")
      .orderBy(col("wkey"), col("doc_id"))
      .limit(k)

  /** DuckDB twin of [[weightedSample]] — same quality expression as the
    * text_quality oracle, same md5→uniform arithmetic, same key. */
  def weightedSampleSql(k: Int, seed: String = "#wrs42"): String = {
    val uTerms = (1 to 6).map { i =>
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}"
    }.mkString("\n      + ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    round(0.4 * least(length(text) / 500.0, 1.0)
       |        + 0.4 * least(len(regexp_extract_all(text, '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))
       |                      / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0)
       |        + 0.2 * (1.0 - least(len(regexp_extract_all(text, '[.,;:!?]'))
       |                      / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0)), 6) AS quality,
       |    md5(CAST(doc_id AS VARCHAR) || '$seed') AS h
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (
       |  SELECT doc_id, quality,
       |    (($uTerms) + 0.5) / 16777216.0 AS u
       |  FROM q)
       |SELECT doc_id, quality, round(-ln(u) / (quality + 0.05), 6) AS wkey
       |FROM s ORDER BY wkey, doc_id LIMIT $k""".stripMargin
  }
}
