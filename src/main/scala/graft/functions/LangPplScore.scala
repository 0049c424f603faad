package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing (stopword hits, avg unigram
  * log-prob) for one text value in a single pass — the language-ID +
  * perplexity scorer of the quality-filter pipeline.
  *
  * Replaces the `mapPartitions` + RowEncoder formulation: that one
  * round-trips the ENTIRE row through external objects, which measured a
  * ~100× per-CPU inflation at 32 threads (object churn + encoder path
  * contention), while this expression evaluates in place on the
  * UTF8String. Models live in static final java.util.HashMaps (read-only,
  * thread-safe). Tokenization is an ASCII scan equivalent to
  * lower(text).split("[^a-z]+") — the synthesized corpora are ASCII; for
  * general unicode the mapPartitions variant remains available.
  * Codegen emits a direct static call — no CodegenFallback row
  * materialization. */
case class LangPplScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("en_hits", IntegerType, nullable = false),
    StructField("avg_logprob", DoubleType, nullable = false)))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    LangPplScore.evalUtf8(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.LangPplScore.evalUtf8(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangPplScore =
    copy(child = newChild)
  override def prettyName: String = "lang_ppl_score"
}

object LangPplScore {
  import graft.transcripts.QualityFilter

  val Oov: Double = QualityFilter.OovLogProb
  /** Model as a zero-allocation char-range table: (log-prob, is-stopword)
    * per vocab word; every stopword is a vocab entry by construction. */
  private[functions] val Words: TextKernels.WordTable =
    new TextKernels.WordTable(QualityFilter.unigramLogProb.map { case (k, v) =>
      k -> (v, QualityFilter.enStopwords.contains(k))
    })

  /** Static per-row kernel (called from generated code). Words are maximal
    * ASCII letter runs, matched lowercased against the vocab table by char
    * range — no per-word String allocation. */
  def evalUtf8(v: UTF8String): InternalRow = {
    val text = if (v == null) "" else v.toString
    var hits = 0
    var lp = 0.0
    var n = 0
    val len = text.length
    var i = 0
    var wordStart = -1
    while (i <= len) {
      val c = if (i < len) text.charAt(i) else ' '
      val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      if (isLetter) { if (wordStart < 0) wordStart = i }
      else if (wordStart >= 0) {
        n += 1
        val idx = Words.find(text, wordStart, i)
        if (idx >= 0) {
          if (Words.isStop(idx)) hits += 1
          lp += Words.logProb(idx)
        } else lp += Oov
        wordStart = -1
      }
      i += 1
    }
    val avg = if (n == 0) Oov else lp / n
    val out = new Array[Any](2)
    out(0) = hits
    out(1) = avg
    new GenericInternalRow(out)
  }

  def lang_ppl_score(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shims
    Shims.toColumn(LangPplScore(Shims.toExpression(c)))
  }
}
