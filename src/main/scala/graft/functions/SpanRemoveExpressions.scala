package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span-removal reassembly for the ExactSubstr action half
  * (ops/Dedup.removeDuplicateSpans): given a doc's token array and the
  * (unsorted) 1-based start positions of its duplicated k-token
  * windows, drop every covered token and re-join the survivors — one
  * imperative O(n + m log m) pass per row.
  *
  * Why an Expression and not composed builtins: the previous
  * formulation (filter/zip_with segment merge + transform/slice/
  * flatten gap reassembly) ran as INTERPRETED higher-order functions —
  * a boxed lambda call per array element per row. Measured on the
  * sf10 dup-heavy stress fixture (500k docs, 30% boilerplate,
  * local[32]) the same job ran 25.7 s with an 8 GiB driver heap but
  * 593 s at 32 GiB — the allocation-heavy interpreted path turns a JVM
  * tuning choice into a 23x cliff. A single codegen'd pass allocates
  * only the kept-token array and the output row, making the operator's
  * cost a function of the data again instead of the heap geometry.
  */
object SpanRemoveCore {
  private val SPACE = UTF8String.fromString(" ")

  /** Coverage walk: token t (1-based) is removed iff some start s has
    * s <= t <= s+k-1. Returns struct(clean_text, n_removed). Static
    * forwarder is called from both nullSafeEval and generated code.
    */
  def remove(toksA: ArrayData, startsA: ArrayData, k: Int): InternalRow = {
    val n = toksA.numElements()
    val m = startsA.numElements()
    if (m == 0) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = toksA.getUTF8String(i); i += 1 }
      return new GenericInternalRow(
        Array[Any](UTF8String.concatWs(SPACE, all: _*), 0))
    }
    val starts = new Array[Int](m)
    var i = 0
    while (i < m) { starts(i) = startsA.getInt(i); i += 1 }
    java.util.Arrays.sort(starts)
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var idx = 0
    var coveredUntil = 0
    var t = 1
    while (t <= n) {
      while (idx < m && starts(idx) <= t) {
        val e = starts(idx) + k - 1
        if (e > coveredUntil) coveredUntil = e
        idx += 1
      }
      if (t > coveredUntil) { kept(nKept) = toksA.getUTF8String(t - 1); nKept += 1 }
      t += 1
    }
    val clean = UTF8String.concatWs(SPACE, java.util.Arrays.copyOf(kept, nKept): _*)
    new GenericInternalRow(Array[Any](clean, n - nKept))
  }

  /** Immediate-repeat starts: 1-based window starts i (i > k) where
    * tokens[i..i+k-1] equals tokens[i-k..i-1]. Static forwarder shared
    * by eval and generated code.
    */
  def loopStarts(toksA: ArrayData, k: Int): ArrayData = {
    val n = toksA.numElements()
    val m = n - (k - 1) // complete k-windows
    if (m <= k) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array.empty[Int])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = toksA.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[Integer]()
    var s = k + 1 // first start with a full window k earlier
    while (s <= m) {
      var j = 0
      var eq = true
      while (eq && j < k) {
        // 0-based: window at s covers toks[s-1 .. s+k-2]
        if (!toks(s - 1 + j).equals(toks(s - 1 - k + j))) eq = false
        j += 1
      }
      if (eq) out.add(s)
      s += 1
    }
    val arr = new Array[Int](out.size())
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }
}

object SpanRemoveExpressions {

  val outType: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))

  /** span_remove_tokens(tokens: array<string>, dupStarts: array<int>, k)
    * -> struct(clean_text: string, n_removed: int). `dupStarts` need
    * not be sorted (sorted internally — saves the upstream array_sort).
    */
  case class SpanRemoveTokens(tokens: Expression, starts: Expression, k: Int)
      extends BinaryExpression {
    override def left: Expression = tokens
    override def right: Expression = starts
    override def dataType: DataType = outType
    override def prettyName: String = "span_remove_tokens"

    override protected def nullSafeEval(t: Any, s: Any): Any =
      SpanRemoveCore.remove(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, s) =>
        s"${ev.value} = graft.functions.SpanRemoveCore.remove($t, $s, $k);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(tokens = newLeft, starts = newRight)
  }

  def span_remove_tokens(toks: Column, starts: Column, k: Int): Column =
    column(SpanRemoveTokens(expression(toks), expression(starts), k))

  /** loop_repeat_starts(tokens: array<string>, k) -> array<int>: the
    * 1-based starts i whose k-token window verbatim-equals the window
    * k positions earlier — every immediate phrase repeat after the
    * first — every OVERLAPPING repeat window reports ("the cat the
    * cat the cat" at k=2 yields starts 3, 4 and 5; the union-coverage
    * excision in [[span_remove_tokens]] collapses them to one span).
    * Detection is doc-local, so pairing this with
    * [[span_remove_tokens]] makes loop collapse one map-side pass:
    * the window-stream explode + per-doc lag window (a doc-keyed sort
    * exchange) and the starts-reassembly join both disappear. Compares
    * token slices directly — the exact semantics the lag-of-md5
    * formulation approximates.
    */
  case class LoopRepeatStarts(child: Expression, k: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(k > 0, "phrase window must be positive")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "loop_repeat_starts"

    override protected def nullSafeEval(t: Any): Any =
      SpanRemoveCore.loopStarts(t.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.functions.SpanRemoveCore.loopStarts($t, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def loop_repeat_starts(toks: Column, k: Int): Column =
    column(LoopRepeatStarts(expression(toks), k))
}
