package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.regexp_replace
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for web-scale corpus cleanup.
  *
  * Crawled corpora mix precomposed and decomposed accent forms
  * ("café" as U+00E9 vs "café" = e + combining acute), which
  * silently breaks every hash-keyed operator downstream: exact dedup,
  * ExactSubstr windows, MinHash shingles, n-gram decontamination and
  * token counting all treat the two spellings as distinct documents /
  * grams. Canonicalizing to NFC (Unicode UAX #15) before hashing is
  * the standard first step of real pipelines (e.g. the cleanup pass
  * crawl-derived corpora run before dedup).
  *
  * Why an Expression and not a UDF: the normalize sits in the hottest
  * possible place — a map over EVERY byte of a 100 TB corpus — and the
  * dominant case (ASCII) needs no work at all. [[TextNormCore.nfc]]
  * scans the UTF8String's raw bytes first and returns the INPUT object
  * untouched when all bytes are < 0x80 (ASCII is NFC-invariant by
  * construction), so the fast path allocates nothing and never
  * materializes a java.lang.String; only rows that actually contain
  * multi-byte sequences pay the ICU-style normalize. `doGenCode` is a
  * single static call, so the expression stays inside whole-stage
  * codegen.
  */
object TextNormCore {
  /** NFC-normalize; ASCII inputs are returned as the same object. */
  def nfc(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((u.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return u
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

object TextNormExpressions {

  /** nfc_normalize(text): canonical-composition normalization with an
    * allocation-free ASCII fast path (see [[TextNormCore]]).
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(input: Any): Any =
      TextNormCore.nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNormCore.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfc_normalize(text: Column): Column =
    column(NfcNormalize(expression(text)))

  /** Strip C0 control characters (except \t \n \r) and DEL — the
    * terminal-garbage bytes crawled text carries that break display,
    * tokenizers, and delimiter-based formats. RE2-compatible class, so
    * any engine replays it; regexp_replace is already codegen'd, so a
    * composed builtin beats a custom expression here (SURVEY §7.3
    * preference order (a)).
    */
  def strip_control(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
}
