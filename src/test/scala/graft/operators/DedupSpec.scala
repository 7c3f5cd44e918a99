package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("exact dedup: representative = min id, counts correct") {
    val df = docs(1L -> "a b c", 2L -> "x y", 3L -> "a b c", 4L -> "a b c")
    val reps = ExactDedup.representatives(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reps == Set((1L, 3L), (2L, 1L)))
  }

  test("exact dedup: dropDuplicateContent keeps one row per content") {
    val df = docs(1L -> "a b c", 2L -> "x y", 3L -> "a b c")
    val kept = ExactDedup.dropDuplicateContent(df, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private val nearDup = base.replace("tonight", "today") // 1-word change
  private val other = "completely different words in this document nothing shared at all here now ok"

  test("minhash LSH finds planted near-duplicate pair, not the unrelated doc") {
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val found = MinHashLSH.nearDuplicates(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 2L)))
  }

  test("minhash verified jaccard equals hand-computed shingle jaccard") {
    val df = docs(1L -> base, 2L -> nearDup)
    val row = MinHashLSH.nearDuplicates(df, "doc_id", "text", threshold = 0.0)
      .collect().head
    def shingles(s: String) =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (shingles(base), shingles(nearDup))
    assert(row.getAs[Long]("inter") == (sa & sb).size.toLong)
    assert(row.getAs[Long]("uni") == (sa | sb).size.toLong)
  }

  test("minhash is deterministic across runs") {
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val a = MinHashLSH.signatures(df, "doc_id", "text").collect().map(_.toSeq).toSet
    val b = MinHashLSH.signatures(df, "doc_id", "text").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("simhash: identical text -> identical hash; near-dup -> small hamming") {
    val df = docs(1L -> base, 2L -> base, 3L -> nearDup, 4L -> other)
    val hs = df.select(col("doc_id"), SimHash.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(3L)) < hamming(hs(1L), hs(4L)))
  }

  test("simhash pairs: exact duplicate found at hamming 0") {
    val df = docs(1L -> base, 2L -> base, 3L -> other)
    val pairs = SimHash.pairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq.contains((1L, 2L, 0L)))
  }

  test("minhash on real documents finds the generator's planted near-dups") {
    val df = graft.Tables(spark, sf("sf0.001"), "documents")
    val top = MinHashLSH.nearDuplicates(df, "doc_id", "text", threshold = 0.8)
    assert(top.count() > 0) // sf0.001 corpus contains >0.8-jaccard pairs
  }

  test("exact dedup: wideHash (128-bit md5 key) output identical to the 64-bit default") {
    val df = docs(1L -> "a b c", 2L -> "x y", 3L -> "a b c", 4L -> "d e", 5L -> "x y")
    def reps(wide: Boolean) =
      ExactDedup.representatives(df, "doc_id", "text", wideHash = wide)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reps(wide = true) == reps(wide = false))
    assert(ExactDedup.dropDuplicateContent(df, "doc_id", "text", wideHash = true)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("minhash bucket cap: oversized buckets SPLIT — identical docs keep star connectivity") {
    // 12 identical documents: every band bucket holds all 12 ids, so the
    // uncapped candidate set is the full 12-choose-2
    val df = docs((1L to 12L).map(i => i -> base): _*)
    assert(MinHashLSH.candidatePairs(df, "doc_id", "text").count() == 66L)
    // cap below the bucket size: the hot bucket splits — the
    // identical-signature group is connected by a min-id star (11
    // edges), so downstream clustering recovers the full 12-clique
    // that the pre-round-13 drop-the-bucket behavior lost entirely,
    // while pair enumeration stays LINEAR in the bucket
    val capped = MinHashLSH.candidatePairs(df, "doc_id", "text",
      maxBucket = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (2L to 12L).map(i => (1L, i)).toSet,
      s"expected the 11-edge min-id star, got ${capped.size} pairs")
    // cap above it: exact semantics preserved
    assert(MinHashLSH.candidatePairs(df, "doc_id", "text",
      maxBucket = Some(100L)).count() == 66L)
  }

  test("simhash bucket cap: oversized buckets are dropped, generous cap is a no-op") {
    // 12 identical documents share one simhash, so every 16-bit band
    // bucket holds all 12 ids and the uncapped pair set is 12-choose-2
    val df = docs((1L to 12L).map(i => i -> base): _*)
    assert(SimHash.pairs(df, "doc_id", "text", maxHamming = 3).count() == 66L)
    // cap below the bucket size: the pathological buckets are excluded
    assert(SimHash.pairs(df, "doc_id", "text", maxHamming = 3,
      maxBucket = Some(5L)).count() == 0L)
    // cap above it: exact band semantics preserved
    assert(SimHash.pairs(df, "doc_id", "text", maxHamming = 3,
      maxBucket = Some(100L)).count() == 66L)
  }
}
