package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def vector_dot(a: Column, b: Column): Column = column(VectorDot(expression(a), expression(b)))
  def vector_norm(a: Column): Column = column(VectorNorm(expression(a)))

  /** Register vector_dot / vector_norm for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_norm", exprs => VectorNorm(exprs.head), "built-in")
  }
}
