package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass counter for the Gopher quality-rule statistics
  * ([[graft.ops.TextAnalysis.gopherRules]]).
  *
  * The composed-builtin formulation materialized, per document: a
  * lowered copy, a full word array, a line array plus a filtered copy,
  * two regexp_replace'd copies of the text, a per-word regex filter
  * and eight array_contains probes — measured 6.2× per decade at
  * sf1→sf10, all allocation and regex. [[GopherStats]] computes the
  * same nine counters in one scan and returns them as an
  * `array<long>`; the rule ratios stay cheap column arithmetic on top
  * (see the indices below).
  *
  * Semantics are EXACTLY the composed form's, wart for wart —
  * spec-pinned against it on random unicode
  * (GopherStatsExpressionSpec):
  *   - words = split(lower(trim(text)), "\\s+") with Spark's limit -1
  *     (a leading whitespace run yields a leading "" word, a trailing
  *     run a trailing ""), where trim strips SPACES only and \s is
  *     Java's ASCII class; the empty-lowered-text guard yields zero
  *     words
  *   - word length = codepoints, alpha = contains [a-z] (ASCII only,
  *     as the regex had it), stop probe = exact membership of the 8
  *     Gopher stop words
  *   - '#' count and non-overlapping-"..." count over the lowered
  *     text (the symbol-ratio numerator)
  *   - lines = split(text, "\\n") on the ORIGINAL text; blank =
  *     empty after space-trim; bullet = first char in {-, *, •};
  *     ellipsis = trimmed line ends with "..." or "…"
  *
  * Pure-ASCII rows (the overwhelming majority of a real corpus, and
  * a cheap one-pass test) take an allocation-free byte scan;
  * any non-ASCII byte falls back to a String-based path that calls
  * the SAME UTF8String trim/toLowerCase and java.util.regex split the
  * builtins use, so parity holds by construction rather than by
  * reimplementation of Unicode case rules.
  */
object GopherStatsExpression {

  /** Output slots of [[gopherStats]]. */
  val N_WORDS = 0        // |split words| (0 when lowered text is empty)
  val SUM_WORD_LEN = 1   // Σ codepoints per word
  val N_ALPHA_WORDS = 2  // words containing [a-z]
  val STOP_MASK = 3      // bit i ⇔ STOPS(i) present as a word
  val N_HASH = 4         // '#' occurrences in lowered text
  val N_ELL3 = 5         // non-overlapping "..." in lowered text
  val N_LINES = 6        // non-blank lines
  val N_BULLET = 7       // non-blank lines starting with -, * or •
  val N_ELLIPSIS = 8     // non-blank lines ending with "..." or "…"
  val SLOTS = 9

  val STOPS: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
  private val stopBytes: Array[Array[Byte]] =
    STOPS.map(_.getBytes("US-ASCII"))

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private val nlPattern = java.util.regex.Pattern.compile("\n")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One-pass counters; static so generated code calls it directly. */
  def gopherStats(s: UTF8String): Array[Long] = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (i < n && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) fastAscii(s) else slowExact(s)
  }

  private def fastAscii(s: UTF8String): Array[Long] = {
    val out = new Array[Long](SLOTS)
    val n = s.numBytes()
    // trim = strip SPACES only (Spark trim), then lowercase on the fly
    var t0 = 0
    while (t0 < n && s.getByte(t0) == ' ') t0 += 1
    var t1 = n
    while (t1 > t0 && s.getByte(t1 - 1) == ' ') t1 -= 1
    def lowByte(i: Int): Byte = {
      val b = s.getByte(i)
      if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
    }
    // ---- words over the trimmed+lowered region -------------------
    if (t1 > t0) { // empty lowered text → zero words (the guard)
      var wordStart = t0
      var wordHasAlpha = false
      def endWord(endExcl: Int): Unit = {
        out(N_WORDS) += 1
        val len = endExcl - wordStart
        out(SUM_WORD_LEN) += len
        if (wordHasAlpha) out(N_ALPHA_WORDS) += 1
        var k = 0
        while (k < stopBytes.length) {
          val sb = stopBytes(k)
          if (sb.length == len) {
            var j = 0
            var eq = true
            while (eq && j < len) { eq = lowByte(wordStart + j) == sb(j); j += 1 }
            if (eq) out(STOP_MASK) |= 1L << k
          }
          k += 1
        }
        wordHasAlpha = false
      }
      // split-with-limit=-1 token walk: a token ends at every ws run
      // and at t1; a ws run at the very start/end contributes the
      // leading/trailing "" token Java split keeps under limit -1
      var i = t0
      var done = false
      while (!done) {
        if (i == t1 || isWs(s.getByte(i))) {
          endWord(i)
          if (i == t1) done = true
          else {
            while (i < t1 && isWs(s.getByte(i))) i += 1
            wordStart = i
            if (i == t1) { endWord(i); done = true } // trailing "" token
          }
        } else {
          val b = s.getByte(i)
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
            wordHasAlpha = true
          if (b == '#') out(N_HASH) += 1
          i += 1
        }
      }
      // non-overlapping "..." over the trimmed region
      var d = t0
      while (d + 2 < t1) {
        if (s.getByte(d) == '.' && s.getByte(d + 1) == '.' &&
          s.getByte(d + 2) == '.') { out(N_ELL3) += 1; d += 3 }
        else d += 1
      }
    }
    // ---- lines over the ORIGINAL text ----------------------------
    var ls = 0
    var p = 0
    while (p <= n) {
      if (p == n || s.getByte(p) == '\n') {
        // line = [ls, p); space-trim it
        var a = ls
        while (a < p && s.getByte(a) == ' ') a += 1
        var z = p
        while (z > a && s.getByte(z - 1) == ' ') z -= 1
        if (z > a) {
          out(N_LINES) += 1
          val f = s.getByte(a)
          if (f == '-' || f == '*') out(N_BULLET) += 1
          if (z - a >= 3 && s.getByte(z - 1) == '.' &&
            s.getByte(z - 2) == '.' && s.getByte(z - 3) == '.')
            out(N_ELLIPSIS) += 1
        }
        ls = p + 1
      }
      p += 1
    }
    out
  }

  /** Non-ASCII fallback: the same counters via the exact builtin
    * machinery (UTF8String trim/toLowerCase, java.util.regex split
    * with limit -1, codepoint lengths).
    */
  private def slowExact(s: UTF8String): Array[Long] = {
    val out = new Array[Long](SLOTS)
    val low = s.trim().toLowerCase.toString
    if (low.nonEmpty) {
      val words = wsPattern.split(low, -1)
      out(N_WORDS) = words.length.toLong
      words.foreach { w =>
        out(SUM_WORD_LEN) += w.codePointCount(0, w.length).toLong
        if (w.exists(c => c >= 'a' && c <= 'z')) out(N_ALPHA_WORDS) += 1
        val k = STOPS.indexOf(w)
        if (k >= 0) out(STOP_MASK) |= 1L << k
      }
      var i = 0
      while (i < low.length) {
        if (low.charAt(i) == '#') out(N_HASH) += 1
        i += 1
      }
      var d = low.indexOf("...")
      while (d >= 0) { out(N_ELL3) += 1; d = low.indexOf("...", d + 3) }
    }
    nlPattern.split(s.toString, -1).foreach { line =>
      var a = 0
      var z = line.length
      while (a < z && line.charAt(a) == ' ') a += 1
      while (z > a && line.charAt(z - 1) == ' ') z -= 1
      if (z > a) {
        out(N_LINES) += 1
        val f = line.charAt(a)
        if (f == '-' || f == '*' || f == '•') out(N_BULLET) += 1
        val t = line.substring(a, z)
        if (t.endsWith("...") || t.endsWith("…")) out(N_ELLIPSIS) += 1
      }
    }
    out
  }

  /** `gopher_stats(text)`: the nine counters as array<long>. */
  case class GopherStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "gopher_stats"

    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(gopherStats(input.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, s =>
        "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.GopherStatsExpression.gopherStats($s))")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: the counters array. */
  def gopher_stats(text: Column): Column =
    column(GopherStats(expression(text)))
}
