package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions for the per-row counting hot
  * paths of the corpus-analysis operators (SURVEY §7.3 preference
  * order (b): custom Expression before UDF when the bench demands it).
  *
  * The composed-builtin formulation of the BPE-ish token count —
  * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))`
  * — MATERIALIZES every matched token as a fresh UTF8String in an
  * array, only to take the array's length: per doc that is thousands
  * of allocations plus a regex-engine pass, and it made
  * q_text_fertility the suite's worst per-decade scaler (7.4× at
  * sf1→sf10). [[BpeTokenCount]] computes the same count in ONE
  * allocation-free byte scan (the alternation has no overlaps or
  * backtracking: letter runs, single digits, single other-non-space
  * codepoints partition the input), inside whole-stage codegen via the
  * static-scanner-call pattern ([[JsonScalarExpressions]]).
  *
  * Semantics are pinned to the Java-regex original and spec-verified
  * against it on random unicode ([[graft.functions
  * TextStatExpressionsSpec]]): `\s` is Java's ASCII class
  * `[ \t\n\x0B\f\r]` (NOT Unicode whitespace — U+00A0 counts as a
  * token character, exactly as the regex counted it), and any
  * non-ASCII codepoint is one `[^A-Za-z0-9\s]` match.
  */
object TextStatExpressions {

  /** One-pass count of `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` matches.
    * Static so generated code calls it directly (stays inside
    * WholeStageCodegen).
    */
  def countBpeTokens(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII byte
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          cnt += 1 // a maximal letter run is ONE match
          i += 1
          while (i < n && {
            val c = s.getByte(i)
            (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
          }) i += 1
        } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') {
          i += 1 // Java \s: ASCII whitespace incl. vertical tab
        } else {
          cnt += 1 // digit or symbol: one match per character
          i += 1
        }
      } else {
        // multibyte codepoint = one [^A-Za-z0-9\s] match (a 4-byte
        // supplementary codepoint is ONE regex match, not two chars)
        cnt += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    cnt
  }

  /** `bpe_token_count(text)`: the GPT-style pre-tokenizer match count,
    * zero per-row allocation.
    */
  case class BpeTokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "bpe_token_count"

    override def nullSafeEval(input: Any): Any =
      countBpeTokens(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        s"graft.functions.TextStatExpressions.countBpeTokens($s)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: BPE-ish token count of a text column (long). */
  def bpe_token_count(text: Column): Column =
    column(BpeTokenCount(expression(text)))

  /** Register bpe_token_count(text) for spark.sql use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count",
      exprs => BpeTokenCount(exprs.head), "built-in")
}
