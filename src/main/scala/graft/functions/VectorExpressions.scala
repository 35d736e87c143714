package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Spark's higher-order functions (zip_with/aggregate) are interpreted
  * (no whole-stage codegen), which dominates the quadratic pair stage
  * of near-duplicate detection: 4M pairs x 64 dims of object-boxed
  * lambda evaluation. These expressions generate a primitive double
  * loop instead (preference order (b) from SURVEY §7.3: custom
  * Expression before UDF), keeping the pair stage inside codegen.
  *
  * Both accept array<float> and array<double> inputs and accumulate in
  * double, matching the semantics of the zip_with/aggregate versions
  * bit-for-bit (sequential left-to-right accumulation).
  */
object VectorExpressions {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** dot(a, b): sum over min(len) of a(i)*b(i), null-intolerant. */
  case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vector_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val xv = if (elemIsFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val yv = if (elemIsFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $s += $xv * $yv; }
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** norm(a): sqrt(sum a(i)^2), null-intolerant. */
  case class VectorNorm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vector_norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      val f = elemIsFloat(child)
      var s = 0.0
      var i = 0
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        val xv = if (elemIsFloat(child)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { double $v = $xv; $s += $v * $v; }
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** srp_signatures(vec): one signed-random-projection bit signature
    * per hash table, all computed in a single codegen pass — the
    * composed-builtin form (zip_with + aggregate per plane) evaluated
    * nTables x nBits interpreted lambda chains per row and dominated
    * LSH cost at corpus scale. Hyperplane coefficients are
    * deterministic (seeded per global plane index, +-1 per dimension,
    * covering up to maxDim dims) and shipped to generated code as a
    * reference object.
    */
  case class SrpSignatures(child: Expression, nBits: Int, nTables: Int)
      extends UnaryExpression {
    private val maxDim = 1024

    // deterministic, matches Similarity.srpSignature's plane seeds
    @transient private lazy val coefs: Array[Array[Double]] =
      Array.tabulate(nTables * nBits) { g =>
        val rnd = new scala.util.Random(0x5eed0000L + g)
        Array.fill(maxDim)(if (rnd.nextBoolean()) 1.0 else -1.0)
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "srp_signatures"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), maxDim)
      val f = elemIsFloat(child)
      val v = new Array[Double](n)
      var d = 0
      while (d < n) { v(d) = if (f) x.getFloat(d).toDouble else x.getDouble(d); d += 1 }
      val sigs = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        var sig = 0L
        var p = 0
        while (p < nBits) {
          val c = coefs(t * nBits + p)
          var proj = 0.0
          var i = 0
          while (i < n) { proj += v(i) * c(i); i += 1 }
          if (proj >= 0) sig |= (1L << p)
          p += 1
        }
        sigs(t) = sig
        t += 1
      }
      new GenericArrayData(sigs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val coefsRef = ctx.addReferenceObj("srpCoefs", coefs, "double[][]")
        val n = ctx.freshName("n")
        val v = ctx.freshName("v")
        val d = ctx.freshName("d")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val proj = ctx.freshName("proj")
        val sig = ctx.freshName("sig")
        val sigs = ctx.freshName("sigs")
        val get = if (elemIsFloat(child)) s"(double) $x.getFloat($d)" else s"$x.getDouble($d)"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $maxDim);
           |double[] $v = new double[$n];
           |for (int $d = 0; $d < $n; $d++) { $v[$d] = $get; }
           |long[] $sigs = new long[$nTables];
           |for (int $t = 0; $t < $nTables; $t++) {
           |  long $sig = 0L;
           |  for (int $p = 0; $p < $nBits; $p++) {
           |    double[] $c = $coefsRef[$t * $nBits + $p];
           |    double $proj = 0.0;
           |    for (int $i = 0; $i < $n; $i++) { $proj += $v[$i] * $c[$i]; }
           |    if ($proj >= 0) $sig |= (1L << $p);
           |  }
           |  $sigs[$t] = $sig;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** pq_adc_ip(codes, lut): asymmetric-distance inner product for a
    * product-quantized vector — sum over subspaces m of
    * lut[m * k + codes[m]], where `codes` is the corpus row's m-byte PQ
    * code (binary) and `lut` is the probe's flattened m x k table of
    * partial inner products against every subspace centroid
    * ([[graft.ops.Pq]] builds both sides from one codebook). This is
    * THE inner loop of billion-scale ANN (Jegou et al. 2011): the
    * per-pair cost drops from `dim` multiplies on two float arrays to
    * `m` table lookups on an m-byte code, and it must stay inside
    * whole-stage codegen for the scan to run at memory bandwidth —
    * an interpreted higher-order-function form would re-box every
    * lookup. Null-intolerant like the other vector expressions.
    */
  case class PqAdcIp(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_ip"

    override def nullSafeEval(codes: Any, lut: Any): Any = {
      val c = codes.asInstanceOf[Array[Byte]]
      val l = lut.asInstanceOf[ArrayData]
      var s = 0.0
      var m = 0
      while (m < c.length) {
        s += l.getDouble(m * k + (c(m) & 0xff))
        m += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, l) => {
        val m = ctx.freshName("m")
        val s = ctx.freshName("s")
        s"""
           |double $s = 0.0;
           |for (int $m = 0; $m < $c.length; $m++) {
           |  $s += $l.getDouble($m * $k + ($c[$m] & 0xff));
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** sq_encode(vec, lo, step) -> binary: per-TENSOR scalar int8
    * quantization (Jegou et al.'s SQ baseline; the faiss
    * ScalarQuantizer QT_8bit shape) — every component clamps to
    * [lo, lo + 255*step] and rounds to its 8-bit level index. One
    * byte per dimension, 4x smaller than float32, and — unlike PQ —
    * decode is two flops, no codebook. Quantization is pure
    * HALF_UP arithmetic on (lo, step), so any engine replays codes
    * bit-for-bit.
    */
  case class SqEncode(child: Expression, lo: Double, step: Double)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "sq_encode"
    // lazy: the child is unresolved (NullType) at construction time
    @transient private lazy val isFloat = elemIsFloat(child)

    override def nullSafeEval(vec: Any): Any = {
      val v = vec.asInstanceOf[ArrayData]
      val out = new Array[Byte](v.numElements())
      var i = 0
      while (i < out.length) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val c = math.max(lo, math.min(lo + 255.0 * step, x))
        out(i) = Math.round((c - lo) / step).toByte
        i += 1
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (isFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, v => {
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        val x = ctx.freshName("x")
        val c = ctx.freshName("c")
        s"""
           |byte[] $out = new byte[$v.numElements()];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  double $x = (double) $v.$get($i);
           |  double $c = Math.max($lo, Math.min($lo + 255.0 * $step, $x));
           |  $out[$i] = (byte) Math.round(($c - $lo) / $step);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** sq_dot(code, probe, lo, step) -> double: inner product of a
    * dequantized SQ code against a float probe — THE scan kernel of
    * SQ search, one fused multiply-add per byte, inside whole-stage
    * codegen so the code table scans at memory bandwidth. Probe is
    * array<double>.
    */
  case class SqDot(left: Expression, right: Expression,
                   lo: Double, step: Double) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sq_dot"

    override def nullSafeEval(code: Any, probe: Any): Any = {
      val c = code.asInstanceOf[Array[Byte]]
      val p = probe.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < c.length) {
        s += (lo + (c(i) & 0xff) * step) * p.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, p) => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $c.length; $i++) {
           |  $s += ($lo + ($c[$i] & 0xff) * $step) * $p.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** centroid_top_ids(vec): ids of the `m` nearest centroids by
    * (cosine DESC, id ASC) against a driver-side centroid matrix —
    * the k-means E-step / probe-list selection that [[graft.ops.Ivf]]
    * previously ran as a boxed Seq[Double] closure UDF (per row: a
    * Seq allocation, k boxed tuple allocations, a sortBy). Ships the
    * centroids as a codegen reference object (the [[SrpSignatures]]
    * pattern) and keeps the arithmetic BIT-IDENTICAL to the closure:
    * vector norm over the row's elements in index order; per centroid
    * the dot accumulates over the CENTROID's length in index order;
    * den = vn * sqrt(cn) with cn summed in the same order (hoisted
    * per centroid — row-independent, so the hoist changes nothing);
    * cosine 0.0 when den == 0; selection scans ids ascending with a
    * strict `>` so ties keep the lowest id, exactly the closure's
    * sortBy((-cos, id)). `cents(c)` must be the centroid with id c
    * (the Ivf build contract: ids are 0..k-1 by construction).
    */
  case class CentroidTopIds(child: Expression,
                            cents: Array[Array[Double]], m: Int)
      extends UnaryExpression {
    require(m >= 1 && m <= cents.length, "m in [1, k]")

    @transient private lazy val cnSqrt: Array[Double] =
      cents.map { cv =>
        var cn = 0.0; var i = 0
        while (i < cv.length) { cn += cv(i) * cv(i); i += 1 }
        math.sqrt(cn)
      }

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "centroid_top_ids"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      val n = x.numElements()
      val v = new Array[Double](n)
      var j = 0
      while (j < n) { v(j) = if (f) x.getFloat(j).toDouble else x.getDouble(j); j += 1 }
      var vn = 0.0
      j = 0
      while (j < n) { vn += v(j) * v(j); j += 1 }
      vn = math.sqrt(vn)
      val k = cents.length
      val cos = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cv = cents(c)
        var d = 0.0
        var i = 0
        while (i < cv.length) { d += cv(i) * v(i); i += 1 }
        val den = vn * cnSqrt(c)
        cos(c) = if (den == 0.0) 0.0 else d / den
        c += 1
      }
      val out = new Array[Int](m)
      val used = new Array[Boolean](k)
      var r = 0
      while (r < m) {
        var best = -1
        c = 0
        while (c < k) {
          if (!used(c) && (best < 0 || cos(c) > cos(best))) best = c
          c += 1
        }
        used(best) = true
        out(r) = best
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
        val cnRef = ctx.addReferenceObj("centroidNorms", cnSqrt, "double[]")
        val k = cents.length
        val n = ctx.freshName("n")
        val v = ctx.freshName("v")
        val j = ctx.freshName("j")
        val vn = ctx.freshName("vn")
        val cos = ctx.freshName("cos")
        val c = ctx.freshName("c")
        val cv = ctx.freshName("cv")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        val den = ctx.freshName("den")
        val out = ctx.freshName("out")
        val used = ctx.freshName("used")
        val r = ctx.freshName("r")
        val best = ctx.freshName("best")
        val get = if (elemIsFloat(child)) s"(double) $x.getFloat($j)" else s"$x.getDouble($j)"
        s"""
           |int $n = $x.numElements();
           |double[] $v = new double[$n];
           |for (int $j = 0; $j < $n; $j++) { $v[$j] = $get; }
           |double $vn = 0.0;
           |for (int $j = 0; $j < $n; $j++) { $vn += $v[$j] * $v[$j]; }
           |$vn = java.lang.Math.sqrt($vn);
           |double[] $cos = new double[$k];
           |for (int $c = 0; $c < $k; $c++) {
           |  double[] $cv = $centsRef[$c];
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $cv.length; $i++) { $d += $cv[$i] * $v[$i]; }
           |  double $den = $vn * $cnRef[$c];
           |  $cos[$c] = ($den == 0.0) ? 0.0 : $d / $den;
           |}
           |int[] $out = new int[$m];
           |boolean[] $used = new boolean[$k];
           |for (int $r = 0; $r < $m; $r++) {
           |  int $best = -1;
           |  for (int $c = 0; $c < $k; $c++) {
           |    if (!$used[$c] && ($best < 0 || $cos[$c] > $cos[$best])) $best = $c;
           |  }
           |  $used[$best] = true;
           |  $out[$r] = $best;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def vector_dot(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))
  def centroid_top_ids(vec: Column, cents: Array[Array[Double]], m: Int): Column =
    column(CentroidTopIds(expression(vec), cents, m))
  def vector_norm(a: Column): Column = column(VectorNorm(expression(a)))
  def srp_signatures(vec: Column, nBits: Int, nTables: Int): Column =
    column(SrpSignatures(expression(vec), nBits, nTables))
  def pq_adc_ip(codes: Column, lut: Column, k: Int): Column =
    column(PqAdcIp(expression(codes), expression(lut), k))
  def sq_encode(vec: Column, lo: Double, step: Double): Column =
    column(SqEncode(expression(vec), lo, step))
  def sq_dot(code: Column, probe: Column, lo: Double, step: Double): Column =
    column(SqDot(expression(code), expression(probe), lo, step))

  /** Register vector_dot / vector_norm for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_norm", exprs => VectorNorm(exprs.head), "built-in")
  }
}
