package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Seeded sampling surface — train/test splits and stratified sampling,
  * the data-mixing ops a training pipeline runs. Engine-specific RNG means
  * no cross-engine oracle; what must hold is determinism under a fixed
  * seed and the statistical contract. */
class SamplingSpec extends SparkSpec {

  test("randomSplit: deterministic, disjoint, complete") {
    val docs = table(spark, sf("sf0.01"), "documents")
    val Array(train1, test1) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    val Array(train2, test2) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    val (t1, v1) = (train1.select("doc_id").collect().map(_.getLong(0)).toSet,
      test1.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(t1 == train2.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(v1 == test2.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert((t1 & v1).isEmpty)
    assert(t1.size + v1.size == docs.count())
    val frac = t1.size.toDouble / docs.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("sampleBy: seeded stratified sampling honors per-stratum fractions") {
    val docs = table(spark, sf("sf0.01"), "documents")
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0, "es" -> 0.25, "zh" -> 0.25)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    assert(s1.select("doc_id").collect().toSeq == s2.select("doc_id").collect().toSeq)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"))
    assert(byLang("de") == base("de"))
    val enRate = byLang("en").toDouble / base("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en sample rate $enRate")
  }

  test("TABLESAMPLE via SQL is seed-deterministic") {
    table(spark, sf("sf0.01"), "documents").createOrReplaceTempView("docs_v")
    def run() = spark.sql(
      "SELECT doc_id FROM docs_v TABLESAMPLE (20 PERCENT) REPEATABLE (99)")
      .collect().map(_.getLong(0)).toSeq
    assert(run() == run())
  }
}
