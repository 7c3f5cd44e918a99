package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val p = CountMin.Params(depth = 4, width = 64)

  private def keysDF(ks: Seq[Long]) = ks.toDF("k")

  test("never underestimates; exact when collision-free") {
    val data = Seq.fill(10)(1L) ++ Seq.fill(3)(2L) ++ Seq(7L)
    val counters = CountMin.build(keysDF(data), "k", p)
    val est = CountMin.estimate(counters, Seq(1L, 2L, 7L, 42L), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(1L) >= 10L && est(2L) >= 3L && est(7L) >= 1L && est(42L) >= 0L)
    // with 4 distinct keys in a 64-wide sketch, some depth row is
    // collision-free for each key with overwhelming margin — but the
    // GUARANTEED property is only one-sided; assert the bound CMS
    // actually promises: est <= exact + total
    val total = data.size.toLong
    assert(est(1L) <= 10L + total && est(42L) <= total)
  }

  test("counter table is bounded by depth*width regardless of input") {
    val counters = CountMin.build(keysDF((1L to 5000L)), "k", p)
    assert(counters.count() <= p.depth.toLong * p.width)
  }

  test("linearity: shard sketches sum to the union sketch") {
    val a = (1L to 400L).map(_ % 17L)
    val b = (1L to 300L).map(_ % 23L)
    val whole = CountMin.build(keysDF(a ++ b), "k", p)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = CountMin.build(keysDF(a), "k", p)
      .union(CountMin.build(keysDF(b), "k", p))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == summed)
  }

  test("bit-identical under repartitioning") {
    val data = keysDF((1L to 1000L).map(i => i * 31 % 97))
    def run(parts: Int) =
      CountMin.estimate(CountMin.build(data.repartition(parts), "k", p),
        (0L to 96L), p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(run(1).sameElements(run(8)))
  }

  test("estimateAll matches literal-key estimate for every distinct key") {
    val data = keysDF((1L to 500L).map(i => i * 13 % 37))
    val sk = CountMin.build(data, "k", p)
    val viaAll = CountMin.estimateAll(sk, data.distinct(), "k", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLit = CountMin.estimate(sk, (0L until 37L), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAll == viaLit.filter { case (k, _) => viaAll.contains(k) })
    assert(viaAll.keySet == (0L until 37L).filter(k =>
      (1L to 500L).exists(i => i * 13 % 37 == k)).toSet)
    // one-sided error: estimates never undercount
    val exact = (1L to 500L).map(i => i * 13 % 37)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) => assert(viaAll(k) >= n) }
  }

  test("driver-side bucketOf mirrors the plan-side bucket expression") {
    val ks = Seq(0L, 1L, CountMin.P - 1, CountMin.P, 123456789L)
    val fromPlan = CountMin.build(keysDF(ks), "k", p)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expected = (for {
      k <- ks
      (ab, i) <- CountMin.perms(p).zipWithIndex
    } yield (i, CountMin.bucketOf(k, ab._1, ab._2, p.width))).toSet
    assert(fromPlan == expected)
  }
}
