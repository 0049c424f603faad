package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Strict JSON parseability as a native expression (replaces the Scala UDF
  * shape): Jackson with FAIL_ON_TRAILING_TOKENS — `try_parse_json` is NOT
  * equivalent (Spark's variant parser accepts `{"k":1}}`, unlike Python
  * json.loads / DuckDB json_valid, column_values_json_parseable.py). Null
  * input → false, matching the UDF it replaces. */
case class JsonParseableExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && JsonSchema.parseable(v.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonParseableExpr =
    copy(child = newChild)
  override def prettyName: String = "json_parseable"
}

/** JSON-Schema subset validation as a native expression
  * (column_values_match_json_schema.py:42-60; pure-JVM validator in
  * graft.functions.JsonSchema). */
case class JsonMatchesSchemaExpr(child: Expression, schema: String)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && JsonSchema.validates(v.asInstanceOf[UTF8String].toString, schema)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonMatchesSchemaExpr =
    copy(child = newChild)
  override def prettyName: String = "json_matches_schema"
}

object JsonExprs {
  import org.apache.spark.sql.graftshim.Shims
  def json_parseable(c: Column): Column =
    Shims.toColumn(JsonParseableExpr(Shims.toExpression(c)))
  def json_matches_schema(c: Column, schema: String): Column =
    Shims.toColumn(JsonMatchesSchemaExpr(Shims.toExpression(c), schema))
}
