package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass MinHash machinery: normalize → distinct word n-gram
  * shingles → k salted-md5 lexicographic minima. Byte-level identical
  * hashing across engines: JVM MessageDigest md5 hex == Spark md5() ==
  * DuckDB md5(). */
private[functions] object MinHashCore {
  val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  def hex(md: MessageDigest, s: String): String =
    hexOf(md.digest(s.getBytes("UTF-8")))

  /** Distinct word n-gram shingles; degenerate docs → whole-text shingle. */
  def shingleSet(text: String, n: Int): java.util.LinkedHashSet[String] = {
    // Locale.ROOT: a Turkish-class default locale would lowercase ASCII
    // 'I' to dotless ı and break md5 parity with lower()/the oracle.
    // No String.trim: it strips every char ≤ U+0020 where the Column
    // spec's SQL trim strips only spaces — \s+ split + empty filter is
    // exactly split(trim(regexp_replace(lower(t),'\s+',' ')), ' ')
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val shingles = new java.util.LinkedHashSet[String]()
    if (toks.length >= n) {
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        shingles.add(sb.toString)
        i += 1
      }
    } else shingles.add(toks.mkString(" "))
    shingles
  }

  /** k lexicographic minima of salted md5 digests over the shingle set.
    *
    * Byte-level: each shingle's UTF-8 bytes are encoded ONCE and digested
    * under k salt prefixes via two update() calls; minima compare as
    * unsigned digest bytes, which orders exactly like the hex string
    * (hex digits '0'-'9','a'-'f' are ASCII-monotone in nibble value), and
    * only the k winners are hex-encoded. Cuts the k×|shingles| String
    * concat + getBytes allocations of the naive form — md5 of
    * ("j:" + shingle) bit-for-bit either way. */
  def signature(shingles: java.util.LinkedHashSet[String], k: Int): Array[String] = {
    val md = mdLocal.get()
    val n = shingles.size
    val bytes = new Array[Array[Byte]](n)
    val it0 = shingles.iterator()
    var s = 0
    while (it0.hasNext) { bytes(s) = it0.next().getBytes("UTF-8"); s += 1 }
    val sig = new Array[String](k)
    var j = 0
    while (j < k) {
      val salt = (j + ":").getBytes("UTF-8")
      var min: Array[Byte] = null
      var i = 0
      while (i < n) {
        md.update(salt)
        md.update(bytes(i))
        val d = md.digest()
        if (min == null || unsignedLt(d, min)) min = d
        i += 1
      }
      sig(j) = hexOf(min)
      j += 1
    }
    sig
  }

  @inline private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hexOf(d: Array[Byte]): String = {
    if (d == null) return null
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val v = d(i) & 0xff
      out(2 * i) = Character.forDigit(v >>> 4, 16)
      out(2 * i + 1) = Character.forDigit(v & 0xf, 16)
      i += 1
    }
    new String(out)
  }

  // --- static per-row kernels (called from generated code) -------------------

  def sigArray(v: UTF8String, k: Int, n: Int): GenericArrayData = {
    val text = if (v == null) "" else v.toString
    val sig = signature(shingleSet(text, n), k)
    new GenericArrayData(sig.map(s => UTF8String.fromString(s): Any))
  }

  def bandsArray(v: UTF8String, k: Int, bands: Int, n: Int): GenericArrayData = {
    MinHashSig.bandsCalls.increment()
    val text = if (v == null) "" else v.toString
    val rowsPerBand = k / bands
    val sig = signature(shingleSet(text, n), k)
    val md = mdLocal.get()
    val keys = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(sig(b * rowsPerBand))
      var r = 1
      while (r < rowsPerBand) {
        sb.append('|').append(sig(b * rowsPerBand + r)); r += 1
      }
      keys(b) = UTF8String.fromString(hex(md, sb.toString))
      b += 1
    }
    new GenericArrayData(keys)
  }

  def shinglesArray(v: UTF8String, n: Int): GenericArrayData = {
    MinHashSig.shingleCalls.increment()
    val text = if (v == null) "" else v.toString
    val set = shingleSet(text, n)
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature as ONE native expression: normalizes, shingles
  * (distinct word 3-grams; whole text when < 3 tokens), and computes k
  * salted-md5 lexicographic minima in a single pass.
  *
  * Exactly equivalent to the Column formulation
  * (array of k × array_min(transform(shingles, md5("j:" ++ s)))) and to the
  * DuckDB oracle — but that expression forest made Catalyst
  * analysis/optimization the bottleneck (~12 s of driver time per
  * execution at ANY data size). Codegen emits a direct static call — no
  * CodegenFallback row materialization. */
case class MinHashSig(child: Expression, k: Int, n: Int = 3)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MinHashCore.sigArray(child.eval(input).asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.MinHashCore.sigArray(
          ${c.isNull} ? null : ${c.value}, $k, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** LSH band keys as ONE native expression: the k-hash signature split into
  * `bands` bands of k/bands rows each; band key = md5 of the '|'-joined
  * signature slice — exactly `md5(concat_ws("|", sig[b*r+1..b*r+r]))` and
  * the DuckDB oracle's `md5(g[3b+1] || '|' || ...)`, without handing
  * Catalyst a bands×rows md5/concat expression forest (which cost ~20 s of
  * one-time plan/codegen per query at ANY data size). */
case class MinHashBands(child: Expression, k: Int, bands: Int, n: Int = 3)
  extends UnaryExpression {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MinHashCore.bandsArray(child.eval(input).asInstanceOf[UTF8String], k, bands, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.MinHashCore.bandsArray(
          ${c.isNull} ? null : ${c.value}, $k, $bands, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

/** Distinct word n-gram shingles as a native expression — same output as
  * the Column formulation in graft.operators.Dedup.shingles (array_distinct
  * over transform/sequence/concat_ws) and DuckDB's list_distinct(
  * list_transform(...)), but a single pass with no expression forest. */
case class Shingles(child: Expression, n: Int = 3)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    MinHashCore.shinglesArray(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.MinHashCore.shinglesArray(
          ${c.isNull} ? null : ${c.value}, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

object MinHashSig {
  import org.apache.spark.sql.graftshim.Shims
  /** Test hook: per-row band-kernel invocations (DedupSpec asserts the LSH
    * pipeline evaluates the kernel once per document, not once per pass).
    * LongAdder: striped — no shared-cache-line CAS in the per-row path. */
  val bandsCalls = new java.util.concurrent.atomic.LongAdder
  /** Test hook: per-row shingle-kernel invocations (DedupSpec asserts the
    * verification stage touches only candidate docs, once each). */
  val shingleCalls = new java.util.concurrent.atomic.LongAdder
  def minhash_sig(c: Column, k: Int): Column =
    Shims.toColumn(MinHashSig(Shims.toExpression(c), k))
  def minhash_bands(c: Column, k: Int, bands: Int): Column =
    Shims.toColumn(MinHashBands(Shims.toExpression(c), k, bands))
  def shingles_native(c: Column, n: Int = 3): Column =
    Shims.toColumn(Shingles(Shims.toExpression(c), n))
}
