package graft.operators

import graft.SparkSuite

class TransitiveClosureSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int,
                  validate: Boolean = false): Set[(Long, Long, Long)] =
    TransitiveClosure.ancestors(edges.toDF("node", "parent"),
        "node", "parent", rounds, validateForest = validate)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Driver-side reference closure: chase parents to the root. */
  private def brute(parent: Map[Long, Long],
                    horizon: Long): Set[(Long, Long, Long)] =
    parent.keySet.flatMap { n =>
      Iterator.iterate(parent.get(n))(_.flatMap(parent.get))
        .takeWhile(_.isDefined).map(_.get)
        .zipWithIndex
        .takeWhile { case (_, i) => i + 1 <= horizon }
        .map { case (a, i) => (n, a, (i + 1).toLong) }
    }

  test("binary-heap forest matches the driver-side closure exactly") {
    // the graph_ancestors derivation at miniature scale: parent = k div 2
    val parent = (1L to 200L).map(k => k -> (k / 2)).toMap
    val edges = parent.toSeq
    // 200 nodes -> max depth 7; rounds=3 covers 8
    assert(run(edges, rounds = 3) == brute(parent, horizon = 8))
  }

  test("deep chain: horizon is exactly 2^rounds, the tail is absent") {
    val parent = (1L until 40L).map(k => (k + 1) -> k).toMap // chain 1..40
    val got = run(parent.toSeq, rounds = 3) // horizon 8
    assert(got == brute(parent, horizon = 8))
    assert(got.map(_._3).max == 8L) // nothing beyond the horizon
    // one more round doubles the reach, and only the reach
    assert(run(parent.toSeq, rounds = 4) == brute(parent, horizon = 16))
  }

  test("each pair is produced exactly ONCE (no dedup shuffle needed)") {
    val parent = (1L to 64L).map(k => k -> (k / 2)).toMap
    val rows = TransitiveClosure.ancestors(
        parent.toSeq.toDF("node", "parent"), "node", "parent", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // collect() sees every physical row: multiset size == set size
    assert(rows.length == rows.toSet.size,
      "a pair surfaced twice — the unique-decomposition invariant broke")
  }

  test("root self-loops are dropped; duplicate edge rows collapse") {
    val edges = Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 2L))
    assert(run(edges, rounds = 2) ==
      Set((2L, 1L, 1L), (3L, 2L, 1L), (3L, 1L, 2L)))
  }

  test("validateForest fails loudly on a node with two parents") {
    val e = intercept[IllegalArgumentException] {
      run(Seq((2L, 1L), (2L, 3L)), rounds = 2, validate = true)
    }
    assert(e.getMessage.contains("not a forest"))
    assert(e.getMessage.contains("2")) // names the offending node
  }

  test("rounds bounds are enforced") {
    intercept[IllegalArgumentException](run(Seq((2L, 1L)), rounds = 0))
    intercept[IllegalArgumentException](run(Seq((2L, 1L)), rounds = 9))
  }
}
