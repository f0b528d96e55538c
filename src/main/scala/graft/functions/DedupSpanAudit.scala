package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-document tail of the substring-dedup rewrite
  * ([[graft.queries.CurationQueries.dedupSpansRewrite]]) in ONE compiled
  * pass: given a doc's token array and the (1-based, distinct, unordered)
  * dup n-gram start positions, a token at position p is REMOVED iff some
  * start x covers it (x ≤ p ≤ x + n − 1); returns
  * struct(n_removed, clean_fp = md5 of the space-joined kept tokens).
  *
  * Replaces a six-HOF interpreted chain per doc (interval-merge
  * `aggregate`, two `transform`s, `zip_with`+`sequence`+`flatten` gap
  * enumeration, then an `element_at` transform feeding the digest) with
  * an O(len + |starts|) two-pointer sweep in compiled JVM code: sort the
  * starts, carry a covered-until watermark, stream kept tokens straight
  * into the md5. Position-for-position identical to the gap enumeration
  * (both emit exactly the uncovered indices in ascending order) — pinned
  * in ScaleOpsSpec against an independent per-token scalar reference
  * over overlap/adjacent/saturated/identity shapes. */
case class DedupSpanAudit(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback {
  require(n >= 1, s"gram width n=$n must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_removed", IntegerType, nullable = false),
    StructField("clean_fp", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"DedupSpanAudit needs (array<string>, array<int>), got $l / $r")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(toks: Any, startsIn: Any): Any = {
    val t = toks.asInstanceOf[ArrayData]
    val len = t.numElements()
    val sa = startsIn.asInstanceOf[ArrayData]
    val starts = new Array[Int](sa.numElements())
    var i = 0
    while (i < starts.length) { starts(i) = sa.getInt(i); i += 1 }
    java.util.Arrays.sort(starts)
    val md = java.security.MessageDigest.getInstance("MD5")
    var removed = 0
    var kept = 0
    var coveredHi = 0 // highest covered position seen so far
    var si = 0
    var p = 1
    while (p <= len) {
      while (si < starts.length && starts(si) <= p) {
        val hi = starts(si) + (n - 1)
        if (hi > coveredHi) coveredHi = hi
        si += 1
      }
      if (p <= coveredHi) removed += 1
      else {
        if (kept > 0) md.update(' '.toByte)
        md.update(t.getUTF8String(p - 1).getBytes)
        kept += 1
      }
      p += 1
    }
    val d = md.digest()
    val cs = new Array[Char](32)
    var b = 0
    while (b < 16) {
      cs(2 * b) = hexDigits((d(b) >> 4) & 0xf)
      cs(2 * b + 1) = hexDigits(d(b) & 0xf)
      b += 1
    }
    new GenericInternalRow(Array[Any](removed, UTF8String.fromString(new String(cs))))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DedupSpanAudit =
    copy(left = newLeft, right = newRight)
}
