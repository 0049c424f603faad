package graft.functions

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass SimHash kernel. Semantics are EXACTLY the Column
  * formulation in graft.operators.Dedup.simhashColumnForm (and the DuckDB
  * oracle): tokens = split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')
  * — whole-empty text yields the single "" token — each token hashed to 60
  * bits via the first 15 hex digits of its md5, fingerprint bit i = majority
  * vote of bit i over tokens (strict majority, ties → 0). NULL text maps to
  * fingerprint 0, exactly like the Column form (every `when` condition is
  * null → the otherwise-0 branch sums to 0).
  *
  * One pass per row: one digest per token, bit counting over a 60-int
  * array — versus the Column forest's ~120 references to the tokenized
  * array (60 × size(filter(...)) + size), the multi-referenced-expensive-
  * Column shape that inflates cold codegen ~5× and leans on subexpression
  * elimination for the tokenization itself. */
object SimHashCore {
  /** Test hook: per-row kernel invocations (DedupSpec asserts the LSH
    * pipeline evaluates the kernel once per document, not once per pass).
    * LongAdder: striped — no shared-cache-line CAS in the per-row path. */
  val calls = new LongAdder

  private val Bits = 60

  /** Tokenize exactly like split(trim(regexp_replace(lower(t),'\s+',' ')),' '):
    * split on \s+ runs, drop the empty edge artifacts, whole-empty → [""].
    * NOT String.trim — that strips every char ≤ U+0020, where SQL trim
    * strips only spaces, so C0-control-edged text would diverge. */
  private[functions] def tokenize(text: String): Array[String] = {
    val raw = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty)
    if (raw.isEmpty) Array("") else raw
  }

  def fingerprint(v: UTF8String): Long = {
    calls.increment()
    val text = if (v == null) "" else v.toString
    // Locale.ROOT: see MinHashCore.shingleSet
    val toks = tokenize(text)
    val md = MinHashCore.mdLocal.get()
    val counts = new Array[Int](Bits)
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes("UTF-8"))
      // first 15 hex digits of the md5 == bytes 0..6 plus the high nibble
      // of byte 7 — identical to conv(substring(md5(w),1,15),16,10)
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      var b = 0
      while (b < Bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      t += 1
    }
    val n = toks.length
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) * 2 > n) fp |= 1L << b
      b += 1
    }
    fp
  }
}

/** 60-bit SimHash fingerprint as ONE native expression (see SimHashCore).
  * Non-nullable: NULL input yields 0L like the Column formulation. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashCore.fingerprint(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      long ${ev.value} = ${c.isNull} ? 0L :
        graft.functions.SimHashCore.fingerprint(${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  import org.apache.spark.sql.graftshim.Shims
  def simhash_sig(c: Column): Column =
    Shims.toColumn(SimHashSig(Shims.toExpression(c)))
}
