package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  // (id, x minimize, y maximize)
  private def skylineOf(rows: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.frontier(rows.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet

  test("matches the brute-force dominance definition") {
    val rows = Seq[(Long, Long, Long)](
      (1, 1, 10), (2, 2, 20), (3, 3, 15), (4, 4, 25), (5, 5, 5))
    // brute force: r dominated iff exists r' with x'<=x, y'>=y, strict somewhere
    val expected = rows.filterNot { r =>
      rows.exists(o => o != r && o._2 <= r._2 && o._3 >= r._3 &&
        (o._2 < r._2 || o._3 > r._3))
    }.map(_._1).toSet
    assert(skylineOf(rows) == expected)
    assert(skylineOf(rows) == Set(1L, 2L, 4L))
  }

  test("coordinate ties are all kept (equal on both dims dominates neither way)") {
    val rows = Seq[(Long, Long, Long)]((1, 1, 10), (2, 1, 10), (3, 2, 5))
    // ids 1,2 share the frontier point (1,10); 3 is dominated
    assert(skylineOf(rows) == Set(1L, 2L))
  }

  test("same-x rows below the group max are dominated") {
    val rows = Seq[(Long, Long, Long)]((1, 1, 10), (2, 1, 8), (3, 2, 12))
    assert(skylineOf(rows) == Set(1L, 3L))
  }

  test("monotone-decreasing input: everything after the first x is dominated") {
    val rows = (1L to 50L).map(i => (i, i, 100L - i))
    assert(skylineOf(rows) == Set(1L))
  }

  test("plan: no quadratic join, frontier broadcast back over the scan") {
    val df = (1L to 1000L).map(i => (i, i % 37, i * 31 % 101)).toDF("id", "x", "y")
    val plan = Skyline.frontier(df, "x", "y").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
