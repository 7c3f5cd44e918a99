package graft.operators

import graft.SparkSuite

class SsspSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                  rounds: Int): Map[Long, Long] =
    Sssp.costs(edges.toDF("src", "dst", "w"), "src", "dst", "w", seeds, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cheapest path beats fewest hops") {
    // 1->3 direct costs 10; 1->2->3 costs 3+4=7
    val e = Seq((1L, 3L, 10L), (1L, 2L, 3L), (2L, 3L, 4L))
    assert(run(e, Seq(1L), rounds = 3) == Map(1L -> 0L, 2L -> 3L, 3L -> 7L))
  }

  test("round budget: the cheap 2-edge path needs 2 rounds") {
    val e = Seq((1L, 3L, 10L), (1L, 2L, 3L), (2L, 3L, 4L))
    // one round only sees 1-edge paths: 3 costs 10
    assert(run(e, Seq(1L), rounds = 1) == Map(1L -> 0L, 2L -> 3L, 3L -> 10L))
  }

  test("extra rounds past the fixpoint are no-ops (monotone relaxation)") {
    val chain = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    val at3 = run(chain, Seq(1L), rounds = 3)
    val at8 = run(chain, Seq(1L), rounds = 8)
    assert(at3 == at8 &&
      at3 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L, 4L -> 15L))
  }

  test("multi-source takes the min over seeds; zero-weight edges fine") {
    val e = Seq((1L, 2L, 9L), (5L, 2L, 1L), (2L, 3L, 0L))
    assert(run(e, Seq(1L, 5L), rounds = 3) ==
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("parallel edges collapse to the cheapest") {
    val e = Seq((1L, 2L, 9L), (1L, 2L, 4L), (1L, 2L, 6L))
    assert(run(e, Seq(1L), rounds = 2) == Map(1L -> 0L, 2L -> 4L))
  }

  test("a cycle cannot lower costs below the fixpoint (non-negative weights)") {
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    assert(run(cyc, Seq(1L), rounds = 8) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("negative weights refuse loudly in-plan") {
    val ex = intercept[Exception] {
      run(Seq((1L, 2L, -1L)), Seq(1L), rounds = 2)
    }
    assert(ex.getMessage != null)
  }

  test("config validation is loud") {
    intercept[IllegalArgumentException] {
      Sssp.costs(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", Nil, 3)
    }
    intercept[IllegalArgumentException] {
      Sssp.costs(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", Seq(1L), 0)
    }
  }

  test("deterministic under repartitioning") {
    val edges = (1L to 300L).map(i => (i % 40, (i * 7) % 40, (i % 5)))
    val df = edges.toDF("src", "dst", "w")
    val a = Sssp.costs(df.repartition(17), "src", "dst", "w", Seq(0L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sssp.costs(df.repartition(2), "src", "dst", "w", Seq(0L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
