package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  private def brute(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
                    r: Long): Set[(Long, Long, Long)] =
    (for {
      (li, lx, ly) <- ls; (ri, rx, ry) <- rs
      d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
      if d2 <= r * r
    } yield (li, ri, d2)).toSet

  private def run(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
                  r: Long): Set[(Long, Long, Long)] =
    SpatialJoin.radiusJoin(
        ls.toDF("id", "x", "y"), "id",
        rs.toDF("id", "x", "y"), "id", "x", "y", r)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .toSet

  test("matches brute force on random points, several radii") {
    val rnd = new scala.util.Random(3)
    val ls = (1L to 80L).map(i => (i, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    val rs = (101L to 180L).map(i => (i, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    for (r <- Seq(1L, 7L, 25L)) {
      assert(run(ls, rs, r) == brute(ls, rs, r), s"radius $r mismatch")
    }
  }

  test("boundary pairs: exactly at distance r and just beyond") {
    val ls = Seq((1L, 10L, 10L))
    val rs = Seq((2L, 13L, 14L),  // dist 5, exactly r
      (3L, 13L, 15L),             // dist > 5
      (4L, 15L, 10L),             // dist 5 along axis (cell boundary)
      (5L, 10L, 10L))             // dist 0
    val out = run(ls, rs, r = 5L)
    assert(out == Set((1L, 2L, 25L), (1L, 4L, 25L), (1L, 5L, 0L)))
  }

  test("cross-cell corners are found (adjacency is 3x3, not 1 cell)") {
    // points on either side of a cell corner at (10,10) with r=10
    val out = run(Seq((1L, 9L, 9L)), Seq((2L, 11L, 11L)), r = 10L)
    assert(out == Set((1L, 2L, 8L)))
  }

  test("empty sides produce empty output") {
    assert(run(Seq.empty, Seq((1L, 5L, 5L)), 5L).isEmpty)
    assert(run(Seq((1L, 5L, 5L)), Seq.empty, 5L).isEmpty)
  }
}
