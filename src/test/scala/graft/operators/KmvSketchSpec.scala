package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  private def keys(r: Range): DataFrame = r.map(_.toLong).toDF("k")
  private def values(d: DataFrame): Array[Double] =
    d.orderBy(col("hv")).collect().map(_.getDouble(0))

  test("sketch is the k smallest distinct hashes, duplicate-insensitive") {
    val once = KmvSketch.sketch(keys(1 to 500), col("k"), 64)
    val dup = KmvSketch.sketch(
      keys(1 to 500).union(keys(1 to 500)), col("k"), 64)
    val v = values(once)
    assert(v.length == 64)
    assert(v.toSeq == v.sorted.toSeq && v.distinct.length == 64)
    assert(values(dup).toSeq == v.toSeq)
  }

  test("sketch of a stream smaller than k is the whole hash set; estimate exact") {
    val v = values(KmvSketch.sketch(keys(1 to 20), col("k"), 64))
    assert(v.length == 20)
    assert(KmvSketch.estimateDistinct(v, 64) == 20.0)
  }

  test("merge equals the sketch of the concatenated stream") {
    val a = keys(1 to 400)
    val b = keys(300 to 700)
    val direct = values(KmvSketch.sketch(a.union(b), col("k"), 64))
    val merged = values(KmvSketch.merge(
      KmvSketch.sketch(a, col("k"), 64),
      KmvSketch.sketch(b, col("k"), 64), 64))
    assert(merged.toSeq == direct.toSeq)
  }

  test("determinism under repartitioning") {
    val base = keys(1 to 1000)
    val v1 = values(KmvSketch.sketch(base, col("k"), 128))
    val v2 = values(KmvSketch.sketch(base.repartition(13, col("k")), col("k"), 128))
    assert(v1.toSeq == v2.toSeq)
  }

  test("distinct and intersection estimates land within KMV error bounds") {
    // |A|=2000, |B|=2000, |A∩B|=1000, |A∪B|=3000; k=256 → σ≈6% of
    // union. Assert 4σ brackets — deterministic given xxhash64.
    val k = 256
    val a = KmvSketch.sketch(keys(1 to 2000), col("k"), k)
    val b = KmvSketch.sketch(keys(1001 to 3000), col("k"), k)
    val (estU, estI) = KmvSketch.intersectEstimate(a, b, k)
    assert(math.abs(estU - 3000) <= 0.25 * 3000, s"union est $estU")
    assert(math.abs(estI - 1000) <= 0.25 * 3000, s"intersect est $estI")
  }

  test("disjoint sets estimate a near-zero intersection") {
    val k = 256
    val a = KmvSketch.sketch(keys(1 to 2000), col("k"), k)
    val b = KmvSketch.sketch(keys(10001 to 12000), col("k"), k)
    val (estU, estI) = KmvSketch.intersectEstimate(a, b, k)
    assert(estI == 0.0, s"disjoint intersect est $estI")
    assert(math.abs(estU - 4000) <= 0.25 * 4000, s"union est $estU")
  }
}
