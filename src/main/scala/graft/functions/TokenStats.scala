package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics: (n_tokens, n_distinct_tokens,
  * n_symbol_chars) — exactly equivalent to
  *   size(split(trim(text), " +")), size(array_distinct(split(...))),
  *   length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))
  * but in one scan without materializing token arrays or a scrubbed copy.
  * Tokens are maximal runs of non-space characters (the corpora contain no
  * other whitespace; trim/split-on-' +' semantics). Codegen emits a direct
  * static call — no CodegenFallback row materialization. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false)))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    TokenStats.evalUtf8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.TokenStats.evalUtf8(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}

object TokenStats {
  /** Static per-row kernel (called from generated code). */
  def evalUtf8(v: UTF8String): InternalRow = {
    val out = new Array[Any](3)
    if (v == null) {
      out(0) = 0; out(1) = 0; out(2) = 0
      return new GenericInternalRow(out)
    }
    val text = v.toString
    val len = text.length
    var nTokens = 0
    var nSymbols = 0
    var tokenStart = -1
    val seen = seenLocal.get()
    seen.reset()
    var i = 0
    while (i <= len) {
      val c = if (i < len) text.charAt(i) else ' '
      if (c != ' ' && i < len) {
        if (tokenStart < 0) tokenStart = i
        val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9')
        // codepoint-counted, like Spark length(): a supplementary-plane
        // char is one symbol, not two UTF-16 code units
        if (!alnum && !Character.isLowSurrogate(c)) nSymbols += 1
      } else if (tokenStart >= 0) {
        nTokens += 1
        seen.add(text, tokenStart, i)
        tokenStart = -1
      }
      i += 1
    }
    out(0) = nTokens
    out(1) = seen.size
    out(2) = nSymbols
    new GenericInternalRow(out)
  }

  /** Reusable exact distinct-token scratch (zero steady-state allocation). */
  private[functions] val seenLocal = new ThreadLocal[TextKernels.TokenSet] {
    override def initialValue(): TextKernels.TokenSet = new TextKernels.TokenSet
  }

  def token_stats(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shims
    Shims.toColumn(TokenStats(Shims.toExpression(c)))
  }
}
