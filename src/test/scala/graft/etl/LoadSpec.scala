package graft.etl

import java.nio.file.Files

import scala.util.{Failure, Success}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.model.Product

/** Load-stage semantics pinned 1:1 with
  * `/root/reference/tests/test_load.py` (FIXTURES.md §3). */
class LoadSpec extends SparkSpec {

  private def cleanRow = {
    import spark.implicits._
    Seq(Product("Test Product", 99.99, 4.5, 3, "M", "Unisex", "2023-10-01")).toDF()
  }
  private def emptyDf = {
    import spark.implicits._
    Seq.empty[Product].toDF()
  }
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  test("CSV write → read-back roundtrip (test_load.py:38-43)") {
    import spark.implicits._
    val path = tmp("csv")
    CsvSink(path, singleFile = true).write(cleanRow)
    val back = spark.read.option("header", "true")
      .schema(graft.model.Schemas.clean).csv(path).as[Product].collect().toSeq
    assert(back == Seq(Product("Test Product", 99.99, 4.5, 3, "M", "Unisex", "2023-10-01")))
  }

  test("empty DataFrame raises LoadError per sink (test_load.py:45-47,84-86,122-124)") {
    assertThrows[LoadError](CsvSink(tmp("csv-empty")).write(emptyDf))
    assertThrows[LoadError](ParquetSink(tmp("pq-empty")).write(emptyDf))
    assertThrows[LoadError](JdbcSink("jdbc:none", "t").write(emptyDf))
  }

  test("no destination → IllegalArgumentException (test_load.py:226-228)") {
    assertThrows[IllegalArgumentException](Load.loadData(cleanRow, Seq.empty))
  }

  test("per-sink failure isolation (test_load.py:162-184)") {
    val good = tmp("iso")
    val boom = new Sink {
      val name = "boom"
      def write(df: DataFrame): String = throw LoadError("sink exploded")
    }
    val results = Load.loadData(cleanRow, Seq(boom, CsvSink(good, singleFile = true)))
    assert(results("csv") == Success(good))
    results("boom") match {
      case Failure(e: LoadError) => assert(e.getMessage == "sink exploded")
      case other => fail(s"unexpected $other")
    }
    val summary = Load.resultSummary(results)
    assert(summary("csv") == good)
    assert(summary("boom_error") == "sink exploded")
  }

  test("parquet sink writes partition-parallel and reads back") {
    val path = tmp("pq")
    ParquetSink(path).write(cleanRow)
    assert(spark.read.parquet(path).count() == 1)
  }
}
