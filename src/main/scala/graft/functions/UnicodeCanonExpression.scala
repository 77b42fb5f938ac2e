package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Unicode canonicalization tier every
  * dedup pipeline needs BEFORE shingling: two visually-identical strings in
  * NFC vs NFD (é as U+00E9 vs e+U+0301) hash to different shingles and
  * silently dedup as distinct documents. Canonicalization is
  *
  *   1. Unicode NFC normalization (canonical decomposition, then canonical
  *      composition — `java.text.Normalizer`; the oracle's utf8proc
  *      `nfc_normalize` implements the same Unicode algorithm), then
  *   2. whitespace/control canonicalization: every run of characters in an
  *      ENUMERATED set (ASCII controls + DEL/C1, Unicode space separators
  *      U+00A0/U+1680/U+2000–U+200A/U+202F/U+205F/U+3000, zero-width
  *      U+200B/U+FEFF, line/para separators U+2028/U+2029) collapses to
  *      one ASCII space, then leading/trailing spaces drop.
  *
  * The set is enumerated — NOT `Character.isWhitespace` — so the DuckDB
  * oracle can mirror it exactly as one RE2 class and both engines agree
  * character-for-character. Idempotent by construction (NFC is idempotent;
  * collapsed output contains none of the collapse set — property-tested).
  *
  * Scale shape: a narrow per-row projection (no shuffle), the same plan as
  * q59's scrub; at 100 TB this runs inside the ingest scan's codegen span
  * and feeds the dedup tier a canonical corpus.
  */
case class UnicodeCanon(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_canon requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_canon"

  protected override def nullSafeEval(input: Any): Any =
    UnicodeCanon.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeCanon.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeCanon =
    copy(child = newChild)
}

object UnicodeCanon {
  /** The collapse set, enumerated (mirrored in [[canonSqlClass]]). */
  private def isCollapse(c: Int): Boolean =
    c <= 0x20 || (c >= 0x7f && c <= 0xa0) || c == 0x1680 ||
      (c >= 0x2000 && c <= 0x200b) || c == 0x2028 || c == 0x2029 ||
      c == 0x202f || c == 0x205f || c == 0x3000 || c == 0xfeff

  /** The same set as one RE2 character class for the DuckDB oracle. */
  val canonSqlClass: String =
    """[\x00- \x7f-\xa0\x{1680}\x{2000}-\x{200b}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}\x{feff}]+"""

  def canon(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isCollapse(cp)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column = GraftBridge.column(UnicodeCanon(GraftBridge.expression(c)))
}
