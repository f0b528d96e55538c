package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Schema evolution across parquet shards — a long-lived pipeline's tables
  * grow columns; readers must reconcile old and new shards. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema reconciles shards written before/after a column was added") {
    val dir = Files.createTempDirectory("graft_evo").toString
    val docs = table(spark, sf("sf0.001"), "documents")
    docs.filter(col("doc_id") < 25)
      .select("doc_id", "text")
      .write.parquet(s"$dir/batch=old")
    docs.filter(col("doc_id") >= 25 && col("doc_id") < 50)
      .select(col("doc_id"), col("text"), col("lang"))
      .write.parquet(s"$dir/batch=new")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "batch"))
    assert(merged.count() == 50)
    // old shards surface the new column as null; new shards carry values
    assert(merged.filter(col("batch") === "old" && col("lang").isNotNull).count() == 0)
    assert(merged.filter(col("batch") === "new" && col("lang").isNull).count() == 0)
  }

  test("unionByName with allowMissingColumns aligns mismatched frames") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "text")
    val b = Seq((2L, "y", "en")).toDF("id", "text", "lang")
    val u = a.unionByName(b, allowMissingColumns = true).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "text", "lang"))
    assert(u.collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq ==
      Seq((1L, true), (2L, false)))
  }
}
