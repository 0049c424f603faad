package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole per-turn scoring pass as ONE expression: language-ID +
  * unigram log-prob (LangPplScore), token statistics (TokenStats), and the
  * PII/toxicity scrub (ScrubFlags) over a single UTF8String→String decode
  * and a single character loop for the two tokenizations.
  *
  * Exactly equivalent to evaluating the three component expressions
  * (spec-enforced) — the fusion exists because the pipeline is
  * DRAM-bandwidth-bound at 32 threads: three separate expressions decode
  * every text three times and allocate three output rows; this does one of
  * each.
  *
  * Codegen: emits a direct static call to [[QfScore.evalUtf8]] on the
  * child's UTF8String — the expression stays inside WholeStageCodegen with
  * no CodegenFallback row materialization and no per-row boxing. */
case class QfScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("en_hits", IntegerType, nullable = false),
    StructField("avg_logprob", DoubleType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false),
    StructField("email_found", BooleanType, nullable = false),
    StructField("phone_found", BooleanType, nullable = false),
    StructField("ssn_found", BooleanType, nullable = false),
    StructField("tox_found", BooleanType, nullable = false),
    StructField("scrubbed_text", StringType, nullable = true)))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    QfScore.evalUtf8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.QfScore.evalUtf8(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QfScore =
    copy(child = newChild)
  override def prettyName: String = "qf_score"
}

object QfScore {
  import LangPplScore.{Oov, Words}

  /** Static per-row kernel (called from generated code). */
  def evalUtf8(v: UTF8String): InternalRow = {
    val out = new Array[Any](10)
    if (v == null) {
      out(0) = 0; out(1) = Oov; out(2) = 0; out(3) = 0; out(4) = 0
      out(5) = false; out(6) = false; out(7) = false; out(8) = false
      out(9) = null
      return new GenericInternalRow(out)
    }
    val text = v.toString
    val len = text.length

    // one loop, two tokenizations (both zero-allocation char-range kernels):
    //  - letter runs (lowercased) for langid/log-prob, as in LangPplScore
    //  - space-delimited tokens + symbol chars, as in TokenStats
    var hits = 0
    var lp = 0.0
    var nWords = 0
    var nTokens = 0
    var nSymbols = 0
    var tokenStart = -1
    var wordStart = -1
    var hasAt = false
    var hasDigit = false
    val seen = TokenStats.seenLocal.get()
    seen.reset()
    var i = 0
    while (i <= len) {
      val c = if (i < len) text.charAt(i) else ' '
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      // langid word state
      val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      if (isLetter) { if (wordStart < 0) wordStart = i }
      else if (wordStart >= 0) {
        nWords += 1
        val idx = Words.find(text, wordStart, i)
        if (idx >= 0) {
          if (Words.isStop(idx)) hits += 1
          lp += Words.logProb(idx)
        } else lp += Oov
        wordStart = -1
      }
      // token-stats state
      if (c != ' ' && i < len) {
        if (tokenStart < 0) tokenStart = i
        val alnum = isLetter || (c >= '0' && c <= '9')
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

    // scrub (same ThreadLocal matchers + replacement order as ScrubFlags).
    // Each matcher runs only when its NECESSARY character class was seen in
    // the main loop — exact gates derived from the fixed patterns (EmailRe
    // requires '@', SsnRe/PhoneRe require a digit, ToxRe the literal
    // "damn"), so the no-PII majority of rows pays zero regex passes.
    val ms = ScrubFlags.sharedMatchers.get()
    val email = hasAt && ms(0).reset(text).find()
    val ssn = hasDigit && ms(1).reset(text).find()
    val phone = hasDigit && ms(2).reset(text).find()
    val tox = text.contains("damn") && ms(3).reset(text).find()
    var s = text
    // see ScrubFlags: once mutated, later patterns re-run unconditionally
    if (email) s = ms(0).reset(s).replaceAll("[EMAIL]")
    if (ssn || (s ne text)) s = ms(1).reset(s).replaceAll("[SSN]")
    if (phone || (s ne text)) s = ms(2).reset(s).replaceAll("[PHONE]")
    if (tox || (s ne text)) s = ms(3).reset(s).replaceAll("[REDACTED]")

    out(0) = hits
    out(1) = if (nWords == 0) Oov else lp / nWords
    out(2) = nTokens
    out(3) = seen.size
    out(4) = nSymbols
    out(5) = email; out(6) = phone; out(7) = ssn; out(8) = tox
    out(9) = if (s eq text) v else UTF8String.fromString(s)
    new GenericInternalRow(out)
  }

  def qf_score(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shims
    Shims.toColumn(QfScore(Shims.toExpression(c)))
  }
}
