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

  // ------------------------------------------------------------- K3: JDBC
  // Dialect coverage note: Derby is the ONLY JDBC engine on the offline
  // classpath (/opt/spark/jars has derby*.jar; no H2/HSQLDB/SQLite), so
  // Derby is the single live dialect these tests can exercise. The sink
  // itself goes through Spark's dialect-agnostic `df.write.jdbc`; the
  // residual risk on another engine (e.g. Postgres, the reference's
  // target) is limited to JDBC type-mapping drift in that engine's
  // JdbcDialect, not sink logic.
  test("JDBC sink: embedded Derby round-trip, schema preflight, overwrite=replace (load.py:205-243)") {
    val url = "jdbc:derby:memory:graftload;create=true"
    val sink = JdbcSink(url, "products", schema = Some("etl"))
    val loc = sink.write(cleanRow)
    assert(loc.endsWith("etl.products"))
    val props = new java.util.Properties
    assert(spark.read.jdbc(url, "etl.products", props).count() == 1)
    // second write: schema preflight must tolerate the existing schema and
    // Overwrite must drop/recreate (if_exists='replace', load.py:221-228)
    sink.write(cleanRow.union(cleanRow))
    val back = spark.read.jdbc(url, "etl.products", props)
    assert(back.count() == 2)
    assert(back.columns.toSeq == cleanRow.columns.toSeq)
  }

  test("JDBC sink: connection failure → LoadError before any write (test_load.py:131-139)") {
    val e = intercept[LoadError](
      JdbcSink("jdbc:derby:memory:missingdb", "t").write(cleanRow))
    assert(e.getMessage.startsWith("Database connection failed"))
  }

  // ---------------------------------------------------------- K2: Sheets
  private class FakeWorksheet extends Sheets.Worksheet {
    var cleared = 0
    var values: Seq[Seq[String]] = Nil
    def clear(): Unit = cleared += 1
    def update(v: Seq[Seq[String]]): Unit = values = v
  }
  private class FakeSpreadsheet(val id: String, hasWorksheet: Boolean)
      extends Sheets.Spreadsheet {
    val ws = new FakeWorksheet
    var added: Option[(String, Int, Int)] = None
    var shared: Option[(String, String)] = None
    def worksheet(name: String): Option[Sheets.Worksheet] =
      if (hasWorksheet) Some(ws) else None
    def addWorksheet(name: String, rows: Int, cols: Int): Sheets.Worksheet = {
      added = Some((name, rows, cols)); ws
    }
    def share(role: String, permType: String): Unit = shared = Some((role, permType))
  }
  private def credsFile: String =
    Files.createTempFile("creds", ".json").toString

  test("sheets sink: open-by-key → clear-then-write → share (test_load.py:55-83)") {
    val sheet = new FakeSpreadsheet("sheet-1", hasWorksheet = true)
    val client = new Sheets.SheetsClient {
      def openByKey(id: String) = if (id == "sheet-1") Some(sheet) else None
      def create(title: String) = fail("must open, not create")
    }
    val id = SheetsSink(client, credsFile, Some("sheet-1")).write(cleanRow)
    assert(id == "sheet-1")
    assert(sheet.ws.cleared == 1, "existing worksheet must be cleared before write")
    assert(sheet.ws.values.head == cleanRow.columns.toSeq)
    assert(sheet.ws.values.length == 2 && sheet.ws.values(1).head == "Test Product")
    assert(sheet.shared.contains(("reader", "anyone")))
  }

  test("sheets sink: no id → create; missing worksheet → sized add (load.py:126-146)") {
    val sheet = new FakeSpreadsheet("fresh-id", hasWorksheet = false)
    val client = new Sheets.SheetsClient {
      def openByKey(id: String) = None
      def create(title: String) = { assert(title.startsWith("Products ETL ")); sheet }
    }
    assert(SheetsSink(client, credsFile).write(cleanRow) == "fresh-id")
    // +10 rows / +5 cols headroom around the 1×7 frame
    assert(sheet.added.contains(("Products", 11, 12)))
    assert(sheet.ws.cleared == 0)
  }

  test("sheets sink: missing credentials file → LoadError (test_load.py:90-93)") {
    val client = new Sheets.SheetsClient {
      def openByKey(id: String) = fail("must not reach the API")
      def create(title: String) = fail("must not reach the API")
    }
    val e = intercept[LoadError](
      SheetsSink(client, "/nonexistent/creds.json").write(cleanRow))
    assert(e.getMessage.startsWith("Credentials file not found"))
  }

  test("sheets sink: API error wraps into LoadError; stale id without create fails (test_load.py:97-105)") {
    val boom = new Sheets.SheetsClient {
      def openByKey(id: String) = None
      def create(title: String) = throw new RuntimeException("API Error")
    }
    val e = intercept[LoadError](SheetsSink(boom, credsFile).write(cleanRow))
    assert(e.getMessage.contains("API Error"))
    val noCreate = SheetsSink(boom, credsFile, Some("stale"), createIfNotExists = false)
    assert(intercept[LoadError](noCreate.write(cleanRow))
      .getMessage.contains("not found"))
  }
}
