package graft.etl

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.model.{Product, RawProduct}

/** Pipeline-level semantics pinned 1:1 with
  * `/root/reference/tests/test_transform.py:74-116` (FIXTURES.md §1). */
class TransformSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      RawProduct("Test Product", "$99.99", "4.5 / 5", "3 Colors", "Size: M", "Gender: Unisex", "2023-10-01"),
      RawProduct("Unknown Product", "N/A", "N/A", "Unknown Colors", "", "", "2023-10-01"),
      RawProduct("Valid Product", "100,50", "3.2 out of 5", "2 Colors", "Size: L", "Gender: Male", "2023-10-01")
    ).toDF()
  }

  test("dirty-row removal count (test_transform.py:74-78)") {
    assert(Transform.removeDirtyData(fixture).count() == 2)
  }

  test("full pipeline values (test_transform.py:85-106)") {
    import spark.implicits._
    val out = Transform.transform(fixture).as[Product]
      .collect().sortBy(_.title).toSeq
    assert(out == Seq(
      Product("Test Product", 99.99 * 16000, 4.5, 3, "M", "Unisex", "2023-10-01"),
      Product("Valid Product", 100.50 * 16000, 3.2, 2, "L", "Male", "2023-10-01")))
  }

  test("empty input → empty output (test_transform.py:108-111)") {
    import spark.implicits._
    assert(Transform.transform(Seq.empty[RawProduct].toDF()).count() == 0)
  }

  test("missing columns → empty output with clean schema (test_transform.py:113-116)") {
    import spark.implicits._
    val single = Seq("Test Product").toDF("title")
    val out = Transform.transform(single)
    assert(out.count() == 0)
    assert(out.schema == graft.model.Schemas.clean)
  }

  test("extra columns pass through untouched") {
    val withId = fixture.withColumn("id", org.apache.spark.sql.functions.lit(7))
    val out = Transform.transform(withId)
    assert(out.columns.contains("id"))
    assert(out.select("id").collect().toSeq == Seq(Row(7), Row(7)))
  }
}
