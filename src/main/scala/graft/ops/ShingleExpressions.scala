package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused min-shingle fingerprint kernel: lowercase-hex md5 of the
  * lexicographically smallest 3-token shingle of a space-tokenized text
  * (null when the text has fewer than 3 tokens).
  *
  * Semantics match the composed form
  * `array_min(transform(sequence(1, n-2), i -> md5(concat_ws(" ", t[i],
  * t[i+1], t[i+2]))))` over `split(text, " ")` — and the DuckDB oracle's
  * `list_aggregate([md5(...) for ...], 'min')` — because (a) splitting on
  * a single space and re-joining with a space reproduces the original
  * byte span, so each shingle's md5 input is a CONTIGUOUS slice of the
  * text's UTF-8 bytes, and (b) lowercase-hex order equals unsigned byte
  * order of the 16-byte digests.
  *
  * Why not the HOF form: per shingle it allocates a 3-slot array, a
  * joined string, and a 32-char hex string, all through interpreted
  * lambda eval outside whole-stage codegen. This kernel does one
  * getBytes, one int[] of token offsets, and one reused MessageDigest —
  * per-row garbage is O(1) regardless of document length, which is what
  * keeps fingerprinting flat at 100 TB (reference computes content
  * digests remotely, e.g. ClickHouse MD5/minhash functions; here it is
  * the local scan's hot loop).
  */
case class MinShingleMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_md5"

  override def nullSafeEval(input: Any): Any =
    MinShingleMd5.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.ops.MinShingleMd5.compute($c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct md5-prefix hashes of every 3-token shingle, as `array<long>`.
  *
  * Value semantics are exactly
  * `conv(substr(md5(shingle), 1, hexDigits), 16, 10)` — the first
  * `hexDigits` hex nibbles of the digest as a non-negative long
  * (hexDigits <= 15 keeps it under 2^60) — over the DISTINCT shingles of
  * `split(text, " ")`, so the DuckDB oracles of the shingle-join dedups
  * keep hashing strings while Spark never materializes them. Hash
  * collisions merge identically on both engines; aggregations downstream
  * (count of distinct hashes, min over rehashes) are collision-stable by
  * construction.
  */
case class ShingleMd5Hashes(child: Expression, hexDigits: Int)
  extends UnaryExpression {

  require(hexDigits >= 1 && hexDigits <= 15, "hexDigits must be 1..15")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_md5_hashes"

  override def nullSafeEval(input: Any): Any =
    MinShingleMd5.computeHashes(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.ops.MinShingleMd5.computeHashes($c, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleMd5 {

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private val emptyLongs = new Array[Long](0)

  /** Token start offsets of `split(text, " ")` over the UTF-8 bytes, or
    * null when there are fewer than 3 tokens. 0x20 never occurs inside a
    * multibyte UTF-8 sequence, so the byte scan is a correct tokenizer
    * (empty tokens included, matching split()).
    */
  private def tokenStarts(b: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < 3) return null
    val starts = new Array[Int](n)
    var t = 1
    i = 0
    while (i < b.length) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts
  }

  /** Static forwarder target for generated code: sorted distinct
    * `hexLen`-nibble md5 prefixes of all 3-token shingles.
    */
  def computeHashes(text: UTF8String, hexLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = text.getBytes
    val starts = tokenStarts(b)
    if (starts == null)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(emptyLongs)
    val n = starts.length
    val md = localMd.get()
    val cur = new Array[Byte](16)
    val out = new Array[Long](n - 2)
    var s = 0
    while (s + 2 < n) {
      val from = starts(s)
      val until = if (s + 3 < n) starts(s + 3) - 1 else b.length
      md.reset()
      md.update(b, from, until - from)
      md.digest(cur, 0, 16)
      var v = 0L
      var k = 0
      while (k < hexLen) {
        val nib = if ((k & 1) == 0) (cur(k >> 1) >> 4) & 0xf else cur(k >> 1) & 0xf
        v = (v << 4) | nib
        k += 1
      }
      out(s) = v
      s += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe (sorted)
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    val exact = if (w == out.length) out else java.util.Arrays.copyOf(out, w)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(exact)
  }

  /** Static forwarder target for generated code (Scala emits a static
    * `compute` on the companion class, callable from Janino).
    */
  def compute(text: UTF8String): UTF8String = {
    val b = text.getBytes
    val starts = tokenStarts(b)
    if (starts == null) return null
    val n = starts.length
    val md = localMd.get()
    val cur = new Array[Byte](16)
    val min = new Array[Byte](16)
    var haveMin = false
    var s = 0
    while (s + 2 < n) {
      val from = starts(s)
      val until = if (s + 3 < n) starts(s + 3) - 1 else b.length
      md.reset()
      md.update(b, from, until - from)
      md.digest(cur, 0, 16)
      if (!haveMin || unsignedLess(cur, min)) {
        System.arraycopy(cur, 0, min, 0, 16)
        haveMin = true
      }
      s += 1
    }
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((min(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(min(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Column builder. */
  def min_shingle_md5(text: Column): Column =
    column(MinShingleMd5(expression(text)))

  /** Column builder: distinct `hexDigits`-nibble md5 prefixes of all
    * 3-token shingles as `array<long>`.
    */
  def shingle_md5_hashes(text: Column, hexDigits: Int): Column =
    column(ShingleMd5Hashes(expression(text), hexDigits))
}
