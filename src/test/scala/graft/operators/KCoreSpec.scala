package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    KCore.core(edges.toDF("u", "v"), "u", "v", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 is a 3-core; appending a pendant leaf changes nothing") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val withLeaf = k4 :+ ((1L, 99L))
    val r = run(withLeaf, k = 3)
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a chain cascades away entirely under k=2") {
    // path 1-2-3-4-5: endpoints peel, then their neighbors, ...
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(r.isEmpty)
  }

  test("a cycle is exactly its own 2-core") {
    val cyc = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1))
    val r = run(cyc, k = 2)
    assert(r.keySet == (1L to 6L).toSet)
    assert(r.values.forall(_ == 2L))
  }

  test("cascade: K4 with a triangle chained off it keeps only the K4 under k=3") {
    // triangle (5,6,7) attached to K4 by single edge 4-5: the triangle
    // nodes have degree 2 (plus one bridge), so k=3 peels 6,7 first,
    // then 5, leaving K4 — requires multiple peel rounds
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tri = Seq((5L, 6L), (6L, 7L), (7L, 5L), (4L, 5L))
    val r = run(k4 ++ tri, k = 3)
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r.values.forall(_ == 3L))
  }

  test("insufficient rounds give the deterministic partial peel") {
    // long dependency chain: pendant path off a triangle peels one
    // node per round under k=2
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val path = Seq((3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    // round 1 prunes 7's edge; the final degree filter then also
    // excludes 6 (its surviving degree fell to 1)
    val r1 = run(tri ++ path, k = 2, rounds = 1)
    assert(r1.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val r4 = run(tri ++ path, k = 2, rounds = 4)
    assert(r4.keySet == Set(1L, 2L, 3L))
    assert(KCore.converged(tri.++(path).toDF("u", "v"), "u", "v", 2, 4))
    assert(!KCore.converged(tri.++(path).toDF("u", "v"), "u", "v", 2, 1))
  }

  test("direction, duplicates and self-loops are normalized away") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 1L))
    val r = run(messy, k = 2)
    assert(r.keySet == Set(1L, 2L, 3L))
  }

  test("identical result under adversarial repartitioning") {
    val edges = (for (i <- 1L to 50L) yield (i, i * 7 % 51 + 1)) ++
      (for (i <- 1L to 50L) yield (i * 11 % 51 + 1, i * 3 % 51 + 1))
    val df = edges.toDF("u", "v")
    val a = KCore.core(df.repartition(1), "u", "v", 3, 6)
      .orderBy("node").collect().toSeq
    val b = KCore.core(df.repartition(5, col("u")), "u", "v", 3, 6)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("converged compares EDGES, not nodes: node-count tie mid-cascade") {
    // a-b, b-c plus K4{c,d,e,f}, k=2: after round 1 (a peeled) the
    // survivor NODE count equals the next round's (b peels, but no
    // node count change until the degree filter) — a node-count test
    // would certify convergence falsely and report c's core_deg as 4.
    // One more round removes b-c; the true 2-core is K4 with c at 3.
    val edges = Seq((1L, 2L), (2L, 3L), // a-b, b-c
      (3L, 4L), (3L, 5L), (3L, 6L), (4L, 5L), (4L, 6L), (5L, 6L)) // K4
    val df = edges.toDF("u", "v")
    assert(!KCore.converged(df, "u", "v", 2, 1),
      "round-1 edge set still shrinks: must not certify")
    assert(KCore.converged(df, "u", "v", 2, 2))
    val r = run(edges, k = 2, rounds = 2)
    assert(r == Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 3L),
      s"true 2-core is K4 with c at core_deg 3, got $r")
  }
}
