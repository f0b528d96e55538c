package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization (Unicode TR15) as a
  * native codegen'd expression — Spark ships no built-in normalizer, and
  * real corpora mix composed (NFC) and decomposed (NFD) byte forms of
  * the SAME text, so every byte-keyed operator (exact dedup, shingle
  * hashing, token counting) silently treats equal strings as distinct
  * unless keys are normalized first. Form is a plan-time constant
  * (NFC/NFD/NFKC/NFKD); the kernel fast-paths already-normalized input
  * (the overwhelmingly common case — `Normalizer.isNormalized` is a
  * cheap quick-check scan) and returns the input UTF8String unchanged,
  * allocating only on actual denormalized rows. Stays inside
  * whole-stage codegen via `defineCodeGen` (a static call per row, like
  * Spark's own `Upper`/`Lower` string expressions).
  *
  * DuckDB twin: `nfc_normalize()` (its only exposed form), which is why
  * the oracle-gated query uses NFC.
  */
case class NormalizeUnicode(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"NormalizeUnicode needs a string input, got ${child.dataType}")
    else if (!NormalizeUnicode.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"NormalizeUnicode form must be one of ${NormalizeUnicode.Forms.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NormalizeUnicode.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object NormalizeUnicode {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Row kernel (also the codegen target): quick-check first, allocate
    * only when the input is actually denormalized. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
