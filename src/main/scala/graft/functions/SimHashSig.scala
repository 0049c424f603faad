package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass SimHash kernel. Semantics are EXACTLY the Column
  * formulation in graft.operators.Dedup.simhashColumnForm (and the DuckDB
  * oracle): tokens = split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')
  * — whole-empty text yields the single "" token — each token hashed to 60
  * bits via the first 15 hex digits of its md5, fingerprint bit i = majority
  * vote of bit i over tokens (strict majority, ties → 0).
  *
  * One pass per row: one digest per token, bit counting over a 60-int
  * array — versus the Column forest's ~120 references to the tokenized
  * array (60 × size(filter(...)) + size), the multi-referenced-expensive-
  * Column shape that inflates cold codegen ~5× and leans on subexpression
  * elimination for the tokenization itself. */
object SimHashCore {
  /** Test hook: per-row kernel invocations (DedupSpec asserts the LSH
    * pipeline evaluates the kernel once per document, not once per pass). */
  val calls = new AtomicLong

  private val Bits = 60

  def fingerprint(v: UTF8String): Long = {
    calls.incrementAndGet()
    val text = if (v == null) "" else v.toString
    // Locale.ROOT: see MinHashCore.shingleSet
    val toks = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
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

/** 60-bit SimHash fingerprint as ONE native expression (see SimHashCore). */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashCore.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashCore.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  import org.apache.spark.sql.graftshim.Shims
  def simhash_sig(c: Column): Column =
    Shims.toColumn(SimHashSig(Shims.toExpression(c)))
}
