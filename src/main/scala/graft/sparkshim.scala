package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and Catalyst `Expression` for Spark 4.x, where
  * the converters are `private[sql]`. Lives under org.apache.spark.sql only
  * to gain package visibility; contains no Spark-internal logic. */
object Shims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Structural identity key for a Column: the NORMALIZED ColumnNode (what
    * Column.equals itself compares) — origins/stack-traces stripped, but
    * semantic modifiers like isDistinct kept, unlike Column.toString which
    * elides them (count(x) and count(DISTINCT x) print identically). */
  def columnKey(c: Column): String = c.node.normalized.toString
}
