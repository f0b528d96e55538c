package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Token and word-k-gram total/distinct counts of a token-array column
  * in ONE compiled per-row pass — the counting kernel of
  * [[graft.ext.TextStats.repetitionStats]]. Returns
  * struct(n_tok, n_tok_d, n_g, n_g_d) (ints; n_g = max(len − k + 1, 0)).
  *
  * Why an expression and not `size(array_distinct(...))`: Spark's
  * `array_distinct` deduplicates non-primitive elements (strings,
  * structs) by PAIRWISE comparison — O(len²) per document — which the
  * 8×-corpus probe exposed as a data-proportional slowdown exactly where
  * long documents live. This pass uses hash sets: O(len) per document,
  * zero exchanges, scan speed at any document length. Gram identity is
  * the space-joined token run, the same string `shingleRows` produces
  * (tokens cannot contain the joiner, so join is injective). Distinct
  * counts over the multiset equal the explode+countDistinct aggregation
  * by definition — pinned in ExtSpec. */
case class RepetitionCounts(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram width k=$k must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_tok_d", IntegerType, nullable = false),
    StructField("n_g", IntegerType, nullable = false),
    StructField("n_g_d", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"RepetitionCounts needs array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new java.util.HashSet[String](Math.max(16, n * 2))
    var i = 0
    while (i < n) { toks.add(arr.getUTF8String(i).toString); i += 1 }
    val g = Math.max(n - k + 1, 0)
    val grams = new java.util.HashSet[String](Math.max(16, g * 2))
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p < g) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(p + j).toString)
        j += 1
      }
      grams.add(sb.toString)
      p += 1
    }
    new GenericInternalRow(Array[Any](n, toks.size, g, grams.size))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}
