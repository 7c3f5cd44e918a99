package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {

  private lazy val docs =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("hashGate selects a stable subset of roughly the requested fraction") {
    val n = docs.count()
    val a = docs.where(Sampling.hashGate(col("doc_id"), 0.2)).count()
    val b = docs.where(Sampling.hashGate(col("doc_id"), 0.2)).count()
    assert(a == b) // value-determined, not run-determined
    assert(a > n / 10 && a < n * 3 / 10, s"fraction drifted: $a of $n")
  }

  test("shardShuffle covers every row exactly once with dense per-shard positions") {
    val out = Sampling.shardShuffle(docs, "doc_id", 8)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // positions within each shard are 1..count(shard), no gaps
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("maxp"), min("pos").as("minp"))
      .where(col("maxp") =!= col("n") || col("minp") =!= 1)
    assert(bad.count() == 0, bad.collect().mkString("; "))
    assert(out.select("shard").distinct().count() == 8)
  }

  test("shardShuffle is reproducible and independent of input partitioning") {
    val a = Sampling.shardShuffle(docs, "doc_id", 8)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Sampling.shardShuffle(docs.repartition(13), "doc_id", 8)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("shardShuffle order differs from id order (it actually shuffles)") {
    val out = Sampling.shardShuffle(docs, "doc_id", 1)
    val byPos = out.orderBy("pos").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(byPos != byPos.sorted, "shuffle left the corpus in id order")
    assert(byPos.sorted == docs.select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
  }

  test("invalid shard counts and fractions are rejected") {
    intercept[IllegalArgumentException](Sampling.shardShuffle(docs, "doc_id", 0))
    intercept[IllegalArgumentException](Sampling.hashGate(col("doc_id"), 0.0))
    intercept[IllegalArgumentException](Sampling.hashGate(col("doc_id"), 1.5))
    intercept[IllegalArgumentException](Sampling.bottomK(docs, "doc_id", 0))
  }

  test("bottomK is mergeable: bottom-k of shard bottom-ks equals the global bottom-k") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    val whole = ids(Sampling.bottomK(docs, "doc_id", 25))
    val half1 = Sampling.bottomK(docs.where(col("doc_id") % 2 === 0), "doc_id", 25)
    val half2 = Sampling.bottomK(docs.where(col("doc_id") % 2 === 1), "doc_id", 25)
    val merged = ids(Sampling.bottomK(
      half1.union(half2).select(col("doc_id")), "doc_id", 25))
    assert(whole == merged)
  }

  test("bottomK nests: the bottom-10 is a prefix of the bottom-25") {
    def ids(k: Int) = Sampling.bottomK(docs, "doc_id", k)
      .collect().map(_.getLong(0)).toSeq
    assert(ids(25).take(10) == ids(10))
  }

  test("groupBottomK emits exactly min(k, group size) per group, deterministically") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.groupBottomK(df, "lang", "doc_id", 7)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val a = run(docs)
    val b = run(docs.repartition(11))
    assert(a == b)
    val sizes = a.groupBy(_._1).view.mapValues(_.size).toMap
    val groupTotals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    groupTotals.foreach { case (g, n) =>
      assert(sizes(g) == math.min(7L, n), s"group $g: ${sizes(g)} of $n")
    }
    // per-group selection equals the global bottomK restricted to the group
    val gA = docs.filter(col("lang") === a.head._1)
    val direct = Sampling.bottomK(gA, "doc_id", 7)
      .collect().map(_.getLong(0)).toSet
    assert(a.filter(_._1 == a.head._1).map(_._2).toSet == direct)
  }

  test("bottomK is partitioning-independent and exactly k") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomK(df, "doc_id", 40).collect().map(_.getLong(0)).toSeq
    val a = run(docs)
    val b = run(docs.repartition(17))
    assert(a == b)
    assert(a.size == 40 && a.distinct.size == 40)
  }
}
