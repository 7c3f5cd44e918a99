package graft.operators

import graft.SparkSuite

class NearDupClustersSpec extends SparkSuite {
  import spark.implicits._

  test("components: chain, clique, and singleton resolve to min-id labels") {
    val nodes = (1L to 8L).toDF("doc_id")
    // chain 1-2-3, clique {4,5,6}, edge 7-? none, 8 singleton via no edges
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val got = NearDupClusters.representatives(nodes, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 8L))
  }

  test("long chain converges within iteration budget") {
    val n = 30L
    val nodes = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = NearDupClusters.representatives(nodes, pairs, "doc_id", maxIterations = 10)
      .collect().map(r => r.getLong(1)).distinct
    // min-label propagation doubles reach per iteration: 10 iters cover length-30 chains
    assert(got.toSeq == Seq(1L))
  }

  test("200-node chain: converges to one cluster in >2 but <=12 propagation rounds") {
    // A path graph is the worst case for label propagation (diameter =
    // n-1); the planted near-dup clusters in the test corpus have
    // diameter ~1, so this is the test that actually makes pointer
    // doubling iterate. Coverage ~doubles per round: a 200-node chain
    // needs ~log2(199) ≈ 8 rounds plus the fixpoint-confirming one.
    val n = 200L
    val nodes = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (reps, iters) = NearDupClusters.representativesWithIterations(
      nodes, pairs, "doc_id", maxIterations = 12)
    val labels = reps.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every chain node must label to min id 0")
    assert(iters > 2, s"a 200-chain must take >2 rounds, took $iters")
    assert(iters <= 12)
  }

  test("dropNearDuplicates keeps one representative per planted cluster") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("tonight", "today"),
      3L -> base.replace("quick", "slow"),
      4L -> "an entirely different document about nothing shared with the others at all ok"
    ).toDF("doc_id", "text")
    val kept = NearDupClusters.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // 1,2,3 cluster together; 4 survives alone
  }
}
