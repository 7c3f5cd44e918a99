package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    Bfs.distances(edges.toDF("src", "dst"), "src", "dst", seeds, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain: distances count hops, budget truncates the tail") {
    // 1 -> 2 -> 3 -> 4 -> 5
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(chain, Seq(1L), maxHops = 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(run(chain, Seq(1L), maxHops = 16) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("direction matters: edges are traversed src -> dst only") {
    val r = run(Seq((2L, 1L), (2L, 3L)), Seq(2L), maxHops = 2)
    assert(r == Map(2L -> 0L, 1L -> 1L, 3L -> 1L))
    // from 1 nothing is reachable (no out-edges)
    assert(run(Seq((2L, 1L), (2L, 3L)), Seq(1L), maxHops = 2) == Map(1L -> 0L))
  }

  test("multi-source: dist is the MIN over seeds; a cycle doesn't loop") {
    // ring of 6; seeds at opposite points 1 and 4
    val ring = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1)) ++
      (1L to 6L).map(i => (if (i == 6L) 1L else i + 1, i))
    val r = run(ring, Seq(1L, 4L), maxHops = 5)
    assert(r == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 1L,
      5L -> 1L))
  }

  test("a seed with no edges is still emitted at dist 0") {
    val r = run(Seq((1L, 2L)), Seq(1L, 42L), maxHops = 2)
    assert(r == Map(1L -> 0L, 42L -> 0L, 2L -> 1L))
  }

  test("duplicated seeds emit one dist-0 row, not two") {
    val rows = Bfs.distances(Seq((1L, 2L)).toDF("src", "dst"),
      "src", "dst", Seq(1L, 1L, 1L), maxHops = 1).collect()
    assert(rows.length == 2) // node 1 once, node 2 once
  }

  test("shorter path wins when a node is reachable at two depths") {
    // 1->2->3 and 1->3 directly: dist(3) = 1, never overwritten to 2
    val r = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq(1L), maxHops = 3)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicate edges change nothing (set semantics)") {
    val r = run(Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)), Seq(1L), 2)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("config validation is loud") {
    intercept[IllegalArgumentException] {
      Bfs.distances(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", Nil, 3)
    }
    intercept[IllegalArgumentException] {
      Bfs.distances(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", Seq(1L), 0)
    }
  }

  test("deterministic under repartitioning") {
    val edges = (1L to 200L).flatMap(i => Seq((i, i % 50), (i % 50, i / 2)))
    val df = edges.toDF("src", "dst").repartition(13)
    val a = Bfs.distances(df, "src", "dst", Seq(7L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Bfs.distances(df.repartition(3), "src", "dst", Seq(7L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
