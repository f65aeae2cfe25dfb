package graft.functions

import java.text.{Normalizer => JNorm}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the Unicode-normalization expressions (called
  * from generated code — keep signatures UTF8String → UTF8String). */
object NormalizeKernels {
  def nfcString(s: String): String =
    if (s == null) null
    else if (JNorm.isNormalized(s, JNorm.Form.NFC)) s
    else JNorm.normalize(s, JNorm.Form.NFC)

  def foldMarksString(s: String): String =
    if (s == null) null else foldMarks(UTF8String.fromString(s)).toString

  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (JNorm.isNormalized(j, JNorm.Form.NFC)) s // common-case fast path
    else UTF8String.fromString(JNorm.normalize(j, JNorm.Form.NFC))
  }

  def foldMarks(s: UTF8String): UTF8String = {
    val folded = JNorm.normalize(s.toString, JNorm.Form.NFD)
      .codePoints().filter(cp => java.lang.Character.getType(cp) match {
        case java.lang.Character.NON_SPACING_MARK |
             java.lang.Character.COMBINING_SPACING_MARK |
             java.lang.Character.ENCLOSING_MARK => false
        case _ => true
      })
      .collect[java.lang.StringBuilder](() => new java.lang.StringBuilder,
        (b, cp) => b.appendCodePoint(cp), (a, b) => a.append(b))
      .toString
    UTF8String.fromString(folded)
  }
}

/** `unicode_nfc(text)`: canonical composition (Unicode NFC) — the fix
  * for composed/decomposed spellings hashing differently in dedup keys.
  * NFC is standard-defined, so the DuckDB oracle (`nfc_normalize`)
  * agrees by construction. */
case class UnicodeNfc(child: Expression) extends UnaryExpression {
  override def prettyName: String = "unicode_nfc"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_nfc needs string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `fold_marks(text)`: NFD + strip combining marks (café→cafe) for
  * match keys where diacritics are noise. No cross-engine standard —
  * spec-pinned, not oracled. */
case class FoldMarks(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fold_marks"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fold_marks needs string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernels.foldMarks(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernels.foldMarks($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
