package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int = 5): Map[Long, Long] =
    LabelPropagation.communities(edges.toDF("u", "v"), "u", "v", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge stay two communities") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L))
    val r = run(edges)
    val left = (1L to 5L).map(r).toSet
    val right = (11L to 15L).map(r).toSet
    assert(left.size == 1, s"left clique must agree: $r")
    assert(right.size == 1, s"right clique must agree: $r")
    assert(left != right, s"bridge must not merge the cliques: $r")
  }

  test("a triangle converges to the minimum label") {
    val r = run(Seq((5L, 7L), (7L, 9L), (9L, 5L)))
    assert(r.values.toSet == Set(5L), s"got $r")
  }

  test("disconnected components never share labels") {
    val r = run(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)))
    val a = Seq(1L, 2L, 3L).map(r).toSet
    val b = Seq(10L, 11L, 12L).map(r).toSet
    assert(a.intersect(b).isEmpty)
  }

  test("fixed rounds are exactly deterministic, including oscillation") {
    // 4-cycle (bipartite): synchronous LPA flip-flops — the fixed
    // budget pins ONE deterministic snapshot of the oscillation
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r3a = run(edges, rounds = 3)
    val r3b = run(edges, rounds = 3)
    assert(r3a == r3b)
  }

  test("identical result under adversarial repartitioning") {
    val edges = (for (i <- 1L to 40L) yield (i, i * 7 % 41 + 1)) ++
      (for (i <- 1L to 40L) yield (i * 11 % 41 + 1, i * 3 % 41 + 1))
    val df = edges.toDF("u", "v")
    val a = LabelPropagation.communities(df.repartition(1), "u", "v", 4)
      .orderBy("node").collect().toSeq
    val b = LabelPropagation.communities(df.repartition(6, col("v")), "u", "v", 4)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
