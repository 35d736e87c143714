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

  /** Static scanner for [[LineChunks]]: groups of `width` whitespace-
    * split tokens re-joined with single spaces — byte-exact with
    * `lineChunks(split(text, "\\s+"), width)` including the split
    * warts (leading/trailing whitespace yields an empty first/last
    * token under Java split's limit -1; "" splits to [""]). Byte-safe
    * for ANY input without a fallback: Java `\s` is six ASCII bytes,
    * which never occur inside a multibyte UTF-8 sequence, and token
    * bytes are copied verbatim.
    */
  def lineChunkArray(s: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    def ws(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    // token spans, mirroring split("\s+", -1)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (n == 0) { starts.add(0); ends.add(0) } // "" -> [""]
    else {
      var i = 0
      var tokStart = 0
      var done = false
      while (!done) {
        if (i == n || ws(bytes(i))) {
          starts.add(tokStart); ends.add(i)
          if (i == n) done = true
          else {
            while (i < n && ws(bytes(i))) i += 1
            tokStart = i
            if (i == n) { starts.add(i); ends.add(i); done = true }
          }
        } else i += 1
      }
    }
    val nToks = starts.size()
    val nChunks = (nToks + width - 1) / width
    val out = new Array[AnyRef](nChunks)
    var c = 0
    while (c < nChunks) {
      val lo = c * width
      val hi = math.min(lo + width, nToks)
      var len = hi - lo - 1 // single-space joiners
      var k = lo
      while (k < hi) { len += ends.get(k) - starts.get(k); k += 1 }
      val buf = new Array[Byte](len)
      var p = 0
      k = lo
      while (k < hi) {
        if (k > lo) { buf(p) = ' '; p += 1 }
        val l = ends.get(k) - starts.get(k)
        System.arraycopy(bytes, starts.get(k), buf, p, l)
        p += l
        k += 1
      }
      out(c) = UTF8String.fromBytes(buf)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** `line_chunks(text, width)`: whitespace tokens re-flowed into
    * `width`-token lines in one pass — the native form of
    * `TextAnalysis.lineChunks(split(text, "\\s+"), width)`, which
    * materialized the full token array, a slice array per line and an
    * interpreted array_join per line (the dominant cost of every
    * lined-text fixture at sf10).
    */
  case class LineChunks(child: Expression, width: Int)
      extends UnaryExpression {
    require(width > 0, "line width must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "line_chunks"

    override def nullSafeEval(input: Any): Any =
      lineChunkArray(input.asInstanceOf[UTF8String], width)

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        s"graft.functions.TextStatExpressions.lineChunkArray($s, $width)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: width-token line chunks of a text column. */
  def line_chunks(text: Column, width: Int): Column =
    column(LineChunks(expression(text), width))

  /** Column API: BPE-ish token count of a text column (long). */
  def bpe_token_count(text: Column): Column =
    column(BpeTokenCount(expression(text)))

  /** Register bpe_token_count(text) for spark.sql use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count",
      exprs => BpeTokenCount(exprs.head), "built-in")
}
