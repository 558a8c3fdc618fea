package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for joins at 100 TB scale.
  *
  * When one join key holds a disproportionate share of the big side
  * (power-law user ids, null-ish defaults), a plain shuffled join sends
  * the whole hot key to ONE reducer. Two complementary tools:
  *
  *  - AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin.*`)
  *    handles it transparently when statistics surface at runtime —
  *    preferred; asserted in SkewSpec.
  *  - [[Skew.saltedJoin]] is the explicit form for when the engine can't
  *    (e.g. the skewed side feeds an aggregation pipeline that must keep
  *    its partitioning): the big side's key is widened with a
  *    deterministic salt in [0, n), the small side is replicated n times,
  *    and the join key becomes (key, salt) — the hot key now spreads over
  *    n reducers at the cost of n-times the (broadcast-sized) small side.
  */
object Skew {

  /** Inner-join `big` with `small` on `key`, spreading each big-side key
    * over `numSalts` reducers. `small` MUST be unique per key (dimension
    * shape) — replication would otherwise duplicate matches.
    *
    * The salt is a deterministic hash of the whole big-side row (not a
    * RNG: retries/speculative tasks must salt identically).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      numSalts: Int = 16): DataFrame = {
    require(numSalts > 0)
    val bigCols = big.columns
    val saltExpr: Column = pmod(hash(bigCols.map(col).toSeq: _*), lit(numSalts))
    val b = big.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    b.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
