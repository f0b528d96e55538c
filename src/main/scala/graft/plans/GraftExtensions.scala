package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NormalizeUnicode, VectorDot}

/** Session-extension entry point: makes graft's native expressions
  * available to the SQL front end.
  *
  * Two registration paths:
  *  - builder-time: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` (or `spark.sql.extensions=graft.plans.GraftExtensions`
  *    cluster-wide) — the idiomatic deployment;
  *  - runtime: [[GraftExtensions.register]] on an already-built session
  *    (what the harness uses, since the driver owns session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    e.injectFunction((
      new FunctionIdentifier("unicode_nfc"),
      new ExpressionInfo(classOf[NormalizeUnicode].getName, "unicode_nfc"),
      (children: Seq[Expression]) => NormalizeUnicode(children.head, "NFC")))
    e.injectOptimizerRule(_ => TopKRewriteRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

  /** Resolve a Column-DSL function once against a one-column dummy frame,
    * yielding a fully-analyzed Catalyst template whose argument attribute
    * can be spliced with the SQL call site's child expression. This reuses
    * the exact Column implementation for SQL — no re-implementation, no
    * unresolved nodes left for the analyzer. */
  private def template(spark: SparkSession,
      fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val analyzed = Seq("x").toDF("__graft_arg")
      .select(fn(col("__graft_arg"))).queryExecution.analyzed
    analyzed.expressions.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
  }

  private def splice(tmpl: Expression, child: Expression): Expression =
    tmpl.transform {
      case att: org.apache.spark.sql.catalyst.expressions.Attribute
          if att.name == "__graft_arg" =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          child, org.apache.spark.sql.types.StringType)
    }

  /** Idempotent runtime registration of all graft SQL functions: the
    * native vector kernel, the Unicode normalizer, and the five
    * reference cleaners. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.registerTempFunction
    import graft.etl.Cleaners
    registerTempFunction(spark, "vector_dot",
      children => VectorDot(children.head, children(1)))
    registerTempFunction(spark, "unicode_nfc",
      children => NormalizeUnicode(children.head, "NFC"))
    val cleaners: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Map("clean_price" -> Cleaners.cleanPrice, "clean_rating" -> Cleaners.cleanRating,
        "clean_colors" -> Cleaners.cleanColors, "clean_size" -> Cleaners.cleanSize,
        "clean_gender" -> Cleaners.cleanGender)
    cleaners.foreach { case (name, fn) =>
      val tmpl = template(spark, fn)
      registerTempFunction(spark, name, children => splice(tmpl, children.head))
    }
  }
}
