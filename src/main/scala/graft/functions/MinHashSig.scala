package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE native expression: normalizes, shingles
  * (distinct word 3-grams; whole text when < 3 tokens), and computes k
  * salted-md5 lexicographic minima in a single pass.
  *
  * Exactly equivalent to the Column formulation
  * (array of k × array_min(transform(shingles, md5("j:" ++ s)))) and to the
  * DuckDB oracle — but that expression forest made Catalyst
  * analysis/optimization the bottleneck (~12 s of driver time per
  * execution at ANY data size). Byte-level identical hashing: JVM
  * MessageDigest md5 hex == Spark md5() == DuckDB md5().
  */
case class MinHashSig(child: Expression, k: Int, n: Int = 3)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val mdLocal =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  private def hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes("UTF-8"))
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

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val text = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
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
    val md = mdLocal.get()
    val sig = new Array[Any](k)
    var j = 0
    while (j < k) {
      var min: String = null
      val it = shingles.iterator()
      val salt = j + ":"
      while (it.hasNext) {
        val h = hex(md, salt + it.next())
        if (min == null || h.compareTo(min) < 0) min = h
      }
      sig(j) = UTF8String.fromString(min)
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def minhash_sig(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shims
    Shims.toColumn(MinHashSig(Shims.toExpression(c), k))
  }
}
