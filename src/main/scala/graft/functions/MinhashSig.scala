package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a token-array column in ONE compiled per-row
  * pass — the narrow form of the explode → 32-way-min aggregation in
  * [[graft.ext.Dedup.minhashSignatures]]. Per word k-gram of the row's
  * own token array: `h = pmod(xxhash64(gram), p)` (the SAME
  * space-joined gram string, bytes, and seed-42 hash as the
  * `shingleRows` + builtin path, via [[XxHash64Function]]); per
  * permutation j: `min over grams of (h·a_j + b_j) mod p`. Duplicate
  * grams cannot change a min, so the multiset here ≡ the aggregation's
  * row stream. Arithmetic stays below 2⁶² (h, a < p ≈ 2³⁰), exactly the
  * bound the aggregation form documents.
  *
  * Why: the row form hashed every exploded shingle row and ran 32
  * min-aggregate columns through a doc_id exchange — per-gram
  * aggregation machinery that existed only to re-group grams the source
  * row already held. Here the whole signature leaves the row formed, at
  * scan speed; the first wide op in the screen is the LSH band join
  * that actually needs a shuffle.
  *
  * Returns array<long> of the `perms.size` signature slots; rows with
  * fewer than k tokens must be filtered OUT by the caller (they have no
  * grams, exactly as they had no shingle rows — this expression returns
  * null for them and the caller's `size(t) >= k` filter keeps the
  * frames identical). Value-identity is pinned in ExtSpec against the
  * explode+agg form. */
case class MinhashSig(child: Expression, k: Int,
    perms: Seq[(Long, Long)], prime: Long)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram width k=$k must be >= 1")
  require(perms.nonEmpty, "need at least one permutation")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MinhashSig needs array<string> tokens, got $t")
  }

  private val as: Array[Long] = perms.map(_._1).toArray
  private val bs: Array[Long] = perms.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val g = n - k + 1
    if (g <= 0) return null // no grams — caller filters these rows out
    val m = as.length
    val mins = Array.fill(m)(Long.MaxValue)
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
      val h0 = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      val h = ((h0 % prime) + prime) % prime
      j = 0
      while (j < m) {
        val v = (h * as(j) + bs(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      p += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
