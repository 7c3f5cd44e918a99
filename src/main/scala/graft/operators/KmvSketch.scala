package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch with SET
  * INTERSECTION estimation — the operation the HLL family (q_sketch_*)
  * cannot do by merge: HLL unions losslessly but intersects only via
  * inclusion–exclusion, whose error compounds with every term. A KMV
  * sketch (the k smallest distinct hash values of a key stream) unions
  * by "k smallest of the pooled values" AND intersects directly: with
  * tau = the union sketch's k-th smallest normalized hash, every
  * sketch value <= tau is a uniform sample of the UNION, so the
  * fraction of sampled values present in BOTH sides estimates the
  * Jaccard similarity, and |A∩B| ≈ jaccard × |A∪B| with relative
  * error O(1/sqrt(k)) of the UNION size (Beyer et al., SIGMOD'07;
  * the same bottom-k estimator family as `Sampling.bottomK`).
  *
  * 100 TB posture: a sketch is ONE distinct-aggregate + top-k per
  * side — the distinct shuffles only 8-byte hashes (map-side partial
  * distinct bounds the exchange), the top-k is TakeOrderedAndProject
  * (per-partition heaps, no sort shuffle). After `limit k` every
  * relation is <= k rows (k ~ 256–4096), so estimation cost is
  * independent of corpus size, and sketches persist/merge like the
  * IncrementalAgg state — any ad-hoc A∩B over archived day-sketches
  * never rescans the raw keys.
  *
  * Determinism: xxhash64 is a pure function of the key, the k-min SET
  * is order-independent, so the estimate is identical under any
  * partitioning or merge order (pinned in KmvSketchSpec).
  */
object KmvSketch {

  /** Normalized hash in (0, 1]: rank of the signed Long hash within
    * the full 2^64 range. Double has 53 mantissa bits so adjacent
    * longs can collide after scaling — irrelevant at k <= 2^20 where
    * the k-th smallest of any realistic stream sits ~k/n into the
    * range and estimator error O(1/sqrt(k)) dwarfs 2^-53 rounding.
    */
  private[operators] def unitHash(c: Column): Column =
    (xxhash64(c).cast("double") - lit(Long.MinValue.toDouble)) /
      lit(math.pow(2.0, 64))

  /** The sketch: k smallest distinct normalized hashes of `key`,
    * one column `hv`. Safe under duplicates (distinct first) and
    * streams shorter than k (the sketch is then the whole hash set —
    * estimators below detect that and go exact).
    */
  def sketch(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 16, s"k=$k too small for a meaningful KMV estimate")
    df.select(unitHash(key).as("hv")).distinct().orderBy(col("hv")).limit(k)
  }

  /** Merged sketch of the union stream: k smallest of the pooled
    * sketch values — exactly `sketch(A ++ B)` because every value the
    * union sketch keeps is within the k smallest of its own side.
    */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).distinct().orderBy(col("hv")).limit(k)

  /** Distinct-count estimate from a collected sketch (ascending
    * values): (k-1)/v_k, or the exact size when the stream had fewer
    * than k distinct keys (then the sketch IS the hash set).
    */
  def estimateDistinct(values: Array[Double], k: Int): Double =
    if (values.length < k) values.length.toDouble
    else (k - 1).toDouble / values.last

  /** (unionEstimate, intersectionEstimate) for two sketches built with
    * the same k. Collects <= 2k doubles — bounded like the ANN
    * training sums, never corpus-dependent.
    */
  def intersectEstimate(a: DataFrame, b: DataFrame, k: Int): (Double, Double) = {
    val av = a.orderBy(col("hv")).collect().map(_.getDouble(0))
    val bv = b.orderBy(col("hv")).collect().map(_.getDouble(0))
    require(av.length <= k && bv.length <= k, "sketch larger than k")
    val pooled = (av ++ bv).distinct.sorted
    val merged = pooled.take(k)
    val estUnion = estimateDistinct(merged, k)
    val aset = av.toSet
    val bset = bv.toSet
    val inBoth = merged.count(v => aset(v) && bset(v))
    // fraction of the union sample seen on both sides = Jaccard est.
    val jaccard = if (merged.isEmpty) 0.0 else inBoth.toDouble / merged.length
    (estUnion, jaccard * estUnion)
  }
}
