package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NormalizeUnicode]] — TR15 normalization: composed/decomposed
  * equivalence, idempotence, nulls, NFKC compatibility folding, the SQL
  * registration, and parity between the codegen and interpreted paths. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val nfc = "caf\u00e9"        // composed U+00E9
  private val nfd = "cafe\u0301"       // decomposed e + U+0301

  test("NFD and NFC byte forms normalize to the same string; ASCII passes through") {
    val rows = Seq(("a", nfc), ("b", nfd), ("c", "plain ascii"), ("d", null))
      .toDF("id", "t")
      .select(col("id"), TextNorm.nfc(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("a") == rows("b"), s"forms must collapse: ${rows("a")} vs ${rows("b")}")
    assert(rows("a") == nfc, "NFC output must be the composed form")
    assert(rows("c") == "plain ascii")
    assert(rows("d") == null, "null propagates")
    // idempotence
    val twice = Seq(nfd).toDF("t")
      .select(TextNorm.nfc(TextNorm.nfc(col("t")))).collect()(0).getString(0)
    assert(twice == nfc)
  }

  test("NFKC folds compatibility forms (ligature fi, fullwidth A)") {
    val got = Seq(("ﬁle", "ＡB")).toDF("a", "b")
      .select(TextNorm.nfkc(col("a")), TextNorm.nfkc(col("b")))
      .collect()(0)
    assert(got.getString(0) == "file", s"ligature: ${got.getString(0)}")
    assert(got.getString(1) == "AB", s"fullwidth: ${got.getString(1)}")
  }

  test("SQL registration (unicode_nfc) and codegen/interpreted parity") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(nfd, nfc, "x", "mixed " + nfd + " tail").toDF("t")
    df.createOrReplaceTempView("norm_in")
    val viaSql = spark.sql("SELECT unicode_nfc(t) AS n FROM norm_in ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    val viaCol = df.select(TextNorm.nfc(col("t")).as("n")).orderBy("n")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol)
    // interpreted path (no codegen): eval the expression directly
    val expr = NormalizeUnicode(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(nfd)))
    assert(expr.eval(null).toString == nfc, "interpreted eval must match")
  }
}
