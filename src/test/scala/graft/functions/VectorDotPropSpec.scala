package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** [[VectorDot]]'s two execution paths must agree bit-for-bit: the
  * interpreted `nullSafeEval` (what constant folding and codegen-fallback
  * plans run) and the `doGenCode` loop (what whole-stage codegen runs on
  * executors). A drift between them is the classic custom-Expression bug —
  * invisible on any single-mode test. Random float vectors with inexact
  * binary values stress the widen-then-multiply order; mismatched and
  * empty lengths pin the shorter-prefix rule on both paths.
  */
class VectorDotPropSpec extends SparkSpec {

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.choose(0, 5)
    xs <- Gen.listOfN(n, Gen.oneOf(0.1f, -0.3f, 0.7f, 1.5f, -2.25f, 0f, 3e4f))
  } yield xs.toArray

  test("interpreted eval ≡ whole-stage codegen, bit-exact, on 60 random vector pairs") {
    import spark.implicits._
    val pairs = Gen.listOfN(60, Gen.zip(vecGen, vecGen)).sample.get
    val df = pairs.toDF("a", "b").localCheckpoint() // freeze input before mode flips
    def run(): Seq[Double] =
      df.select(VectorOps.dot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    // juxtapose raw bits: 0.0 == -0.0 under ==, but they're different results
    assert(codegen.map(java.lang.Double.doubleToLongBits) ==
      interpreted.map(java.lang.Double.doubleToLongBits),
      s"codegen/interpreted drift:\n${codegen.zip(interpreted).filter(p => p._1 != p._2)}")
    // and both honor the shorter-prefix rule: scalar reference
    val want = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    }
    assert(codegen == want, "dot must fold left-to-right over the shorter prefix")
  }
}
