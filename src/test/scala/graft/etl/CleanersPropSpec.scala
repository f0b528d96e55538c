package graft.etl

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests (SURVEY.md §5 test plan item 2): the Catalyst cleaners
  * must agree with a direct Scala model of the reference semantics
  * (`/root/reference/utils/transform.py`) on arbitrary inputs — not just
  * the pinned fixture values.
  *
  * One documented divergence: digit runs that overflow Int/Double parse to
  * null via `try_cast` where Python's unbounded int would succeed; the
  * generators stay inside the reference's real domain (≤8 digits).
  */
class CleanersPropSpec extends SparkSpec {

  /** Direct transliteration of the reference cleaners for comparison. */
  object Model {
    def price(v: String): Option[Double] = {
      if (v == null || v.trim.isEmpty) return None
      val s = v.replaceAll("[^0-9.,]", "")
      val s2 = if (s.contains(",") && !s.contains(".")) s.replace(",", ".") else s
      val s3 = s2.replace(",", "")
      // mirror Spark's try_cast: at most one dot, at least one digit
      if (s3.nonEmpty && s3.count(_ == '.') <= 1 && s3.exists(_.isDigit))
        try Some(s3.toDouble * 16000.0) catch { case _: NumberFormatException => None }
      else None
    }
    private val ratingRe = "\\d+(?:\\.\\d+)?".r
    def rating(v: String): Option[Double] =
      Option(v).flatMap(s => ratingRe.findFirstIn(s)).map(_.toDouble)
    private val intRe = "\\d+".r
    def colors(v: String): Option[Int] =
      if (v == null || v == "" || v == "Unknown Colors") None
      else intRe.findFirstIn(v).flatMap(d => scala.util.Try(d.toInt).toOption)
    def size(v: String): Option[String] =
      Option(v).map(_.replaceAll("(?i)^Size:\\s*", "").trim).filter(_.nonEmpty)
    def gender(v: String): Option[String] =
      Option(v).map(_.replaceAll("(?i)^Gender:\\s*", "").trim).filter(_.nonEmpty)
  }

  private val weird = Gen.oneOf("N/A", "", "   ", "Unknown Colors", "Size:", "Gender:  ",
    "⭐", "$", ",", ".", "..", "1.2.3", "-5", "1,2,3", "0,99", "  Size: M  ")
  private val priceish = for {
    d <- Gen.choose(0, 99999); c <- Gen.choose(0, 99)
    pre <- Gen.oneOf("$", "", "USD ", "Rp")
    sep <- Gen.oneOf(".", ",")
  } yield s"$pre$d$sep$c"
  private val texty = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(
    "Size:", "Gender:", "Colors", "/ 5", "⭐", "$1,000.50", "4.5"))).map(_.mkString(" "))
  private val inputs: Gen[String] = Gen.frequency(3 -> priceish, 2 -> texty, 2 -> weird,
    1 -> Gen.asciiPrintableStr.map(_.take(30)))

  private def samples(n: Int): Seq[String] = {
    val g = Gen.listOfN(n, inputs)
    Iterator.continually(g.sample).flatten.next() :+ null
  }

  private def check[T](name: String, cleaner: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      model: String => Option[T]): Unit = {
    import spark.implicits._
    val in = samples(400)
    val got = in.toDF("v").select(cleaner(col("v")).as("out")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.get(0)))
    val want = in.map(model)
    in.lazyZip(got).lazyZip(want).foreach { (i, g, w) =>
      assert(g == w, s"$name(${Option(i).map("\"" + _ + "\"")}) spark=$g model=$w")
    }
  }

  test("clean_price ≡ reference model on 400 arbitrary inputs")(
    check("price", Cleaners.cleanPrice, Model.price))
  test("clean_rating ≡ reference model")(
    check("rating", Cleaners.cleanRating, Model.rating))
  test("clean_colors ≡ reference model")(
    check("colors", Cleaners.cleanColors, Model.colors))
  test("clean_size ≡ reference model")(
    check("size", Cleaners.cleanSize, Model.size))
  test("clean_gender ≡ reference model")(
    check("gender", Cleaners.cleanGender, Model.gender))

  // NB: cleanSize is deliberately NOT idempotent ("Size: Size: M" strips one
  // prefix per application) — faithful to the reference's anchored re.sub.
  test("clean_size/gender outputs are trimmed and never empty") {
    import spark.implicits._
    val in = samples(300)
    val out = in.toDF("v")
      .select(Cleaners.cleanSize(col("v")).as("s"), Cleaners.cleanGender(col("v")).as("g"))
      .collect()
    out.foreach { r =>
      Seq(0, 1).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getString(i)
          assert(v.nonEmpty && v == v.trim, s"bad output '$v'")
        }
      }
    }
  }
}
