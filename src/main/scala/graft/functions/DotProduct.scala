package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product over two float/double arrays as ONE native
  * expression: bit-identical to
  *   aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)),
  *             0.0, (acc,v) => acc + v)
  * and to DuckDB's list_sum(list_transform(list_zip(...))) — same element
  * order, same IEEE double operations — but without materializing the
  * zipped intermediate array per pair (the allocation that dominated the
  * candidate-verification stage of the embedding near-dup operators).
  * Null array or length mismatch → null, matching zip_with's null padding
  * propagating through the sum. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Only float/double element arrays: getDouble on an int/long slot would
    * reinterpret raw bits, so other numeric arrays are rejected at analysis
    * (the Column formulation's implicit cast must be applied by the caller). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // lazy: children may be unresolved when Catalyst copies the tree
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dpTmp")
      s"""
        java.lang.Double $tmp =
          graft.functions.DotProduct.fold($a, $b, $leftFloat, $rightFloat);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object DotProduct {
  import org.apache.spark.sql.graftshim.Shims
  def dot_product(a: Column, b: Column): Column =
    Shims.toColumn(DotProduct(Shims.toExpression(a), Shims.toExpression(b)))

  /** Static sequential fold (called from generated code); null on length
    * mismatch or a null element, matching the zip_with formulation. */
  def fold(xs: ArrayData, ys: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): java.lang.Double = {
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (leftFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rightFloat) ys.getFloat(i).toDouble else ys.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
