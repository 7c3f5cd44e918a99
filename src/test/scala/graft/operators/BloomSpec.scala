package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val p = Bloom.Params(bits = 256, hashes = 3, seed = 7L)

  private def keys(ks: Seq[Long]) = ks.toDF("id").select(
    col("id"), (col("id") * 7919L % 104729L).as("key"))

  test("no false negatives: every protected key is a hit") {
    val protectedSet = keys(1L to 50L)
    val bits = Bloom.bitset(protectedSet, "key", p)
    val out = Bloom.mightContain(protectedSet, "id", "key", bits, p)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size == 50 && out.values.forall(identity),
      "a bloom filter can never miss a member")
  }

  test("bitset is bounded by `bits` and FP rate shrinks as bits grow") {
    val protectedSet = keys(1L to 200L)
    val others = keys(10000L to 12000L)
    def fpCount(bits: Int): Long = {
      val prm = p.copy(bits = bits)
      val b = Bloom.bitset(protectedSet, "key", prm)
      assert(b.count() <= bits.toLong)
      Bloom.mightContain(others, "id", "key", b, prm)
        .where(col("bloom_hit")).count()
    }
    val small = fpCount(256)
    val large = fpCount(16384)
    assert(small > 0, "a saturated small filter should show FPs")
    assert(large < small, s"more bits must cut FPs: $small -> $large")
  }

  test("duplicated member rows stay hits (no-false-negatives under duplicate ids)") {
    // regression: the membership count used to see 2x the probe rows
    // for a duplicated id and read a true member as a non-member —
    // the exact failure the one-sided contract forbids
    val member = keys(Seq(5L))
    val dup = member.union(member)
    val bits = Bloom.bitset(member, "key", p)
    val out = Bloom.mightContain(dup, "id", "key", bits, p).collect()
    assert(out.length == 1 && out.head.getBoolean(1),
      s"duplicated member must remain a hit: ${out.toSeq}")
  }

  test("membership is deterministic under repartitioning") {
    val ks = keys(1L to 300L)
    def run(parts: Int) = {
      val b = Bloom.bitset(ks.repartition(parts), "key", p)
      Bloom.mightContain(keys(200L to 500L), "id", "key", b, p)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    }
    assert(run(1).sameElements(run(6)))
  }

  test("membership probe plans a broadcast of the bitset, not a shuffle join") {
    val b = Bloom.bitset(keys(1L to 100L), "key", p)
    val plan = Bloom.mightContain(keys(1L to 100L), "id", "key", b, p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }
}
