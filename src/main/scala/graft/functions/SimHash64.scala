package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token-array column in ONE compiled per-row pass —
  * the narrow form of [[graft.ext.Dedup.simhashes]]. Per token:
  * `xxhash64(token)` (the SAME bytes-and-seed-42 hash as the Spark
  * builtin, via [[XxHash64Function]]); per bit: vote +1 when set, −1 when
  * clear over the token MULTISET; signature bit i is 1 iff its vote sum
  * is strictly positive — exactly the explode → 64-conditional-sum
  * aggregation this replaces (pinned in ExtSpec against an inline copy).
  *
  * Why: the row form exploded the corpus token stream and ran 64
  * conditional-sum aggregate columns per token row through a doc_id
  * exchange — per-token aggregation machinery (and a shuffle) that
  * existed only to re-group tokens the source row already held. Here the
  * vote loop runs in compiled JVM code at scan speed and the signature
  * leaves the row fully formed; the first wide op in the screen is the
  * 16-bit-band candidate join that actually needs a shuffle. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 needs array<string> tokens, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sh = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sh |= (1L << i)
      i += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
