package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("u", "v"), "u", "v")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("a single triangle: every corner counts it; clustering 1.0") {
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach { case (tri, deg, c) =>
      assert(tri == 1L && deg == 2L && c == 1.0)
    }
  }

  test("square without diagonals has zero triangles") {
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    r.values.foreach { case (tri, _, c) => assert(tri == 0L && c == 0.0) }
  }

  test("K4: each node in 3 triangles, clustering 1.0") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val r = run(edges)
    r.foreach { case (n, (tri, deg, c)) =>
      assert(tri == 3L, s"node $n tri=$tri")
      assert(deg == 3L && c == 1.0)
    }
  }

  test("direction, duplicates and self-loops are normalized away") {
    // same triangle declared messily: reversed edges, dups, a loop
    val r = run(Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L)))
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach { case (tri, deg, _) => assert(tri == 1L && deg == 2L) }
  }

  test("hub-and-spoke: hub participates in every rim triangle, leaves in one") {
    // wheel: hub 0 joined to rim 1..6, rim is a cycle
    val rim = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1))
    val spokes = (1L to 6L).map(i => (0L, i))
    val r = run(rim ++ spokes)
    assert(r(0L)._1 == 6L) // one triangle per rim edge
    // each rim node: (hub, prev, i) and (hub, i, next) — exactly 2
    (1L to 6L).foreach(i => assert(r(i)._1 == 2L))
    // hub clustering: 2*6 / (6*5) = 0.4
    assert(math.abs(r(0L)._3 - 0.4) < 1e-15)
  }

  test("matches the brute-force count on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.15
    } yield (a.toLong, b.toLong)).toSeq
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((a min b, a max b))
    val brute = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if has(a, b) && has(b, c) && has(a, c)
    } yield Seq(a.toLong, b.toLong, c.toLong)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val r = run(edges)
    brute.foreach { case (node, tri) =>
      assert(r(node)._1 == tri, s"node $node: got ${r(node)._1}, want $tri")
    }
    // nodes with no triangles report 0, not absence (if they have an edge)
    r.foreach { case (node, (tri, _, _)) =>
      assert(tri == brute.getOrElse(node, 0L))
    }
  }

  test("result is identical under adversarial repartitioning") {
    val edges = (for (i <- 1L to 60L) yield (i, i * 7 % 61 + 1)) ++
      (for (i <- 1L to 60L) yield (i * 13 % 61 + 1, i * 5 % 61 + 1))
    val df = edges.toDF("u", "v")
    val a = Triangles.perNode(df.repartition(1), "u", "v")
      .orderBy("node").collect().toSeq
    val b = Triangles.perNode(df.repartition(7, col("v")), "u", "v")
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
