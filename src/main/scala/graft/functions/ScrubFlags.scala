package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled-regex PII/toxicity scrubber as ONE expression: per row it
  * produces (email_found, phone_found, ssn_found, tox_found,
  * scrubbed_text) in a single evaluation.
  *
  * Semantically identical to chaining rlike×4 + regexp_replace×4 (it uses
  * the same java.util.regex engine and the same replacement order:
  * email → ssn → phone → tox), but:
  *  - Matchers are ThreadLocal and reset per row — no Matcher allocation;
  *  - replacement runs only when the corresponding find() hit, so the
  *    no-PII majority of rows allocates nothing beyond the output;
  * the chained-column formulation allocates 4 intermediate copies of every
  * row's text, which makes the pipeline DRAM-bandwidth-bound and caps
  * multi-core scaling (measured 0.5 efficiency at 8→32 threads).
  * Codegen emits a direct static call — no CodegenFallback row
  * materialization. */
case class ScrubFlags(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("email_found", BooleanType, nullable = false),
    StructField("phone_found", BooleanType, nullable = false),
    StructField("ssn_found", BooleanType, nullable = false),
    StructField("tox_found", BooleanType, nullable = false),
    StructField("scrubbed_text", StringType, nullable = true)))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ScrubFlags.evalUtf8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.ScrubFlags.evalUtf8(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubFlags =
    copy(child = newChild)
  override def prettyName: String = "scrub_flags"
}

object ScrubFlags {
  import graft.transcripts.QualityFilter._

  private val patterns: Array[Pattern] =
    Array(EmailRe, SsnRe, PhoneRe, ToxRe).map(Pattern.compile)

  private[functions] val matchers = new ThreadLocal[Array[Matcher]] {
    override def initialValue(): Array[Matcher] = patterns.map(_.matcher(""))
  }
  /** Shared with the fused QfScore expression. */
  private[functions] def sharedMatchers: ThreadLocal[Array[Matcher]] = matchers

  /** Static per-row kernel (called from generated code). */
  def evalUtf8(v: UTF8String): InternalRow = {
    val out = new Array[Any](5)
    if (v == null) {
      out(0) = false; out(1) = false; out(2) = false; out(3) = false
      out(4) = null
      return new GenericInternalRow(out)
    }
    val text = v.toString
    // one cheap char scan gates the four regex passes: each matcher runs
    // only when its NECESSARY character class occurs (exact gates derived
    // from the fixed patterns — EmailRe requires '@', SsnRe/PhoneRe a
    // digit, ToxRe the literal "damn")
    var hasAt = false
    var hasDigit = false
    var gi = 0
    val glen = text.length
    while (gi < glen && !(hasAt && hasDigit)) {
      val c = text.charAt(gi)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      gi += 1
    }
    val ms = matchers.get()
    val email = hasAt && ms(0).reset(text).find()
    val ssn = hasDigit && ms(1).reset(text).find()
    val phone = hasDigit && ms(2).reset(text).find()
    val tox = text.contains("damn") && ms(3).reset(text).find()
    var s = text
    // replacement order mirrors the chained regexp_replace formulation:
    // email → ssn → phone → tox. Once the text has MUTATED, later patterns
    // must re-run unconditionally — an earlier substitution can create a
    // word boundary that enables a later match (e.g. "[EMAIL]555-…" where
    // "…com555-…" had none), exactly as the chained form would scrub.
    if (email) s = ms(0).reset(s).replaceAll("[EMAIL]")
    if (ssn || (s ne text)) s = ms(1).reset(s).replaceAll("[SSN]")
    if (phone || (s ne text)) s = ms(2).reset(s).replaceAll("[PHONE]")
    if (tox || (s ne text)) s = ms(3).reset(s).replaceAll("[REDACTED]")
    out(0) = email; out(1) = phone; out(2) = ssn; out(3) = tox
    out(4) = if (s eq text) v else UTF8String.fromString(s)
    new GenericInternalRow(out)
  }

  def scrub_flags(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shims
    Shims.toColumn(ScrubFlags(Shims.toExpression(c)))
  }
}
