package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorDot

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
  }
}

object GraftExtensions {
  /** Idempotent runtime registration of all graft SQL functions. */
  def register(spark: SparkSession): Unit =
    GraftColumnBridge.registerTempFunction(spark, "vector_dot",
      children => VectorDot(children.head, children(1)))
}
