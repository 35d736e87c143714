package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column is engine-agnostic (ColumnNode-backed) and the
  * catalyst bridge (`classic.ExpressionUtils`) is private[sql]. This
  * object lives in the org.apache.spark.sql package tree solely to
  * re-export the two conversions custom Expressions need — the
  * standard pattern for out-of-tree Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
