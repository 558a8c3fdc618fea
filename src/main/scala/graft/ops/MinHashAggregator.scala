package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed MinHash-sketch aggregator (the `Aggregator[IN, BUF, OUT]` UDAF
  * surface of SURVEY §2.9): folds 32-bit shingle hashes into a k-wide
  * min-signature; `merge` is the elementwise-min sketch UNION, so partial
  * sketches combine associatively across partitions/executors — the
  * property that lets signatures build map-side at any scale, and lets
  * per-shard sketches union without re-reading documents.
  *
  * Uses the same universal affine family as the d03 gate query
  * (h_i = (37+101i)h + 17+97i mod 2^31-1), so sketches from either path
  * are comparable.
  */
class MinHashSketch(val numHashes: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val P = 2147483647L

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val hi = ((37L + 101L * i) * h + 17L + 97L * i) % P
      if (hi < buf(i)) buf(i) = hi
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashSketch {
  /** Column form: `df.groupBy("doc_id").agg(minhash_sketch(col("h")))`. */
  def minhash_sketch(h: Column, numHashes: Int = 16): Column =
    udaf(new MinHashSketch(numHashes), Encoders.scalaLong).apply(h)

  /** Estimated Jaccard between two sketches = matching-position fraction. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
