package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the per-cleaner scalar semantics 1:1 with
  * `/root/reference/tests/test_transform.py:25-72` (FIXTURES.md §1). */
class CleanersSpec extends SparkSpec {

  private def run[T](cleaner: Column => Column, inputs: Seq[String]): Seq[Option[T]] = {
    import spark.implicits._
    inputs.toDF("v").select(cleaner(col("v")).as("out"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.get(0).asInstanceOf[T]))
  }

  test("clean_price: valid inputs (test_transform.py:26-28)") {
    assert(run[Double](Cleaners.cleanPrice, Seq("$99.99", "100,50", "1,000.50")) ==
      Seq(Some(99.99 * 16000), Some(100.50 * 16000), Some(1000.50 * 16000)))
  }

  test("clean_price: invalid inputs → null (test_transform.py:30-34)") {
    assert(run[Double](Cleaners.cleanPrice,
      Seq("N/A", "", "   ", "Price Unavailable", null)) == Seq.fill(5)(None))
  }

  test("clean_rating: valid inputs (test_transform.py:36-39)") {
    assert(run[Double](Cleaners.cleanRating,
      Seq("4.5 / 5", "3.2 out of 5", "⭐4.5", "Rating: ⭐ 4.8 / 5")) ==
      Seq(Some(4.5), Some(3.2), Some(4.5), Some(4.8)))
  }

  test("clean_rating: invalid inputs → null") {
    assert(run[Double](Cleaners.cleanRating, Seq("N/A", "", "Invalid", null)) ==
      Seq.fill(4)(None))
  }

  test("clean_colors: valid inputs (test_transform.py:47-54)") {
    assert(run[Int](Cleaners.cleanColors, Seq("3 Colors", "2 Colors Available", "5")) ==
      Seq(Some(3), Some(2), Some(5)))
  }

  test("clean_colors: invalid inputs → null") {
    assert(run[Int](Cleaners.cleanColors,
      Seq("Unknown Colors", "", "no digits", null)) == Seq.fill(4)(None))
  }

  test("clean_size: prefix-strip + trim (test_transform.py:56-63)") {
    assert(run[String](Cleaners.cleanSize,
      Seq("Size: M", "Size: Large", "size:  XL ", "M", "", null)) ==
      Seq(Some("M"), Some("Large"), Some("XL"), Some("M"), None, None))
  }

  test("clean_gender: prefix-strip + trim (test_transform.py:65-72)") {
    assert(run[String](Cleaners.cleanGender,
      Seq("Gender: Unisex", "Gender: Male", "Women", "", null)) ==
      Seq(Some("Unisex"), Some("Male"), Some("Women"), None, None))
  }
}
