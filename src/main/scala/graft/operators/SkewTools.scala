package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for shuffle joins.
  *
  * At 100 TB a handful of hot keys (a viral document, a default user
  * id) can put one shuffle partition hours behind the rest. Two
  * complementary answers:
  *
  *  1. AQE's runtime skew-join splitting
  *     (`spark.sql.adaptive.skewJoin.enabled`, on by default) — no code
  *     change, but only kicks in for sort-merge joins above size
  *     thresholds.
  *  2. Explicit salting ([[saltedJoin]]) — deterministic pre-spreading
  *     of the build side, for when the skew is known and AQE's
  *     granularity isn't enough (e.g. a single key holding >50% of
  *     rows).
  *
  * Salting shape: the skewed (large) side gets a salt in [0, factor)
  * derived from a hash of its whole row — deterministic, no RNG, so
  * retried tasks and re-runs produce identical partitioning. The small
  * side is replicated `factor` times. The join key becomes
  * (key, salt), spreading each hot key over `factor` partitions; cost
  * is factor-times replication of the smaller side, so choose factor ~
  * (hot-key rows / target partition rows).
  */
object SkewTools {

  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    // join types that preserve unmatched rows of the REPLICATED side
    // would emit them `factor` times; restrict to the safe ones.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports $allowed (the replicated side must not " +
        s"preserve unmatched rows), got '$joinType'")
    val saltCol = "__graft_salt"
    val salted = skewed.withColumn(saltCol,
      pmod(hash(skewed.columns.toIndexedSeq.map(col): _*), lit(factor)))
    val replicated = other.withColumn(saltCol,
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
