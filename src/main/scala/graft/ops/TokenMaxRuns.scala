package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused repetition-statistics kernel for the Gopher-style quality
  * filter: one pass over the text's UTF-8 bytes returns
  * `[max_word_mult, n_words, max_bigram_mult, n_bigrams]` (null when
  * fewer than 2 tokens).
  *
  * Semantics match the composed form — max equal-run of
  * `array_sort(split(text, ' '))` and of the adjacent-bigram array — and
  * the DuckDB oracle's unnest + GROUP BY multiplicity counting. Key
  * facts making the byte-level version exact: 0x20 never occurs inside a
  * multibyte UTF-8 sequence (the byte scan IS split(' '), empty tokens
  * included), and a bigram `t[i] + " " + t[i+1]` is the CONTIGUOUS byte
  * span from t[i]'s start to t[i+1]'s end, so bigram equality is span
  * equality.
  *
  * Why not the HOF form: per token it allocates a comparison struct
  * through interpreted lambda eval (2 sorts x n tokens x struct state);
  * here sorting reuses one index array with a byte-span comparator and
  * the scan allocates O(1) — the difference between 1.6s and ~0.2s at
  * sf0.1, and between a GC-bound and CPU-bound scan at 100 TB.
  */
case class TokenMaxRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_max_runs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"token_max_runs expects STRING, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenMaxRuns.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.ops.TokenMaxRuns.compute($c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenMaxRuns {

  def token_max_runs(text: Column): Column = column(TokenMaxRuns(expression(text)))

  /** Static forwarder target for generated code. */
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    // token start offsets (split on single space, empty tokens included)
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < 2) return null
    val starts = new Array[Int](n)
    var t = 1
    i = 0
    while (i < b.length) { if (b(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }

    // span i: bytes [from(i), until(i)) — for tokens and for bigrams
    def spanEnd(idx: Int): Int = if (idx + 1 < n) starts(idx + 1) - 1 else b.length

    def maxMult(count: Int, from: Int => Int, until: Int => Int): Long = {
      val idx = new Array[Integer](count)
      var k = 0
      while (k < count) { idx(k) = k; k += 1 }
      val cmp = new java.util.Comparator[Integer] {
        override def compare(x: Integer, y: Integer): Int = {
          var a = from(x); val ae = until(x)
          var c = from(y); val ce = until(y)
          while (a < ae && c < ce) {
            val d = (b(a) & 0xff) - (b(c) & 0xff)
            if (d != 0) return d
            a += 1; c += 1
          }
          (ae - from(x)) - (ce - from(y))
        }
      }
      java.util.Arrays.sort(idx, cmp)
      var best = 1L
      var run = 1L
      k = 1
      while (k < count) {
        if (cmp.compare(idx(k - 1), idx(k)) == 0) { run += 1; if (run > best) best = run }
        else run = 1L
        k += 1
      }
      best
    }

    val maxW = maxMult(n, starts(_), spanEnd(_))
    // bigram span i covers tokens i and i+1 including the joining space
    val maxBg = maxMult(n - 1, starts(_), i => spanEnd(i + 1))
    UnsafeArrayData.fromPrimitiveArray(Array(maxW, n.toLong, maxBg, (n - 1).toLong))
  }
}
