package graft.expressions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The Hilbert kernel's mathematical contract, plus the locality win
  * over Morton that justifies its existence.
  */
class HilbertSpec extends SparkSuite {

  private val side = 64 // the first side² indexes fill the [0,side)² block

  test("hilbert is a bijection onto the first side^2 indexes") {
    val ds = for (x <- 0 until side; y <- 0 until side)
      yield BitKernels.hilbert(x, y)
    assert(ds.toSet == (0L until (side.toLong * side)).toSet,
      "the order-31 curve must fill the low block exactly once")
  }

  test("consecutive hilbert indexes are always-adjacent cells") {
    val pos = new Array[(Int, Int)](side * side)
    for (x <- 0 until side; y <- 0 until side)
      pos(BitKernels.hilbert(x, y).toInt) = (x, y)
    (1 until side * side).foreach { d =>
      val (x0, y0) = pos(d - 1)
      val (x1, y1) = pos(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"step $d jumps from ($x0,$y0) to ($x1,$y1)")
    }
  }

  test("hilbert ranges cover tighter boxes than morton on the same data") {
    // split the grid's index range into equal runs (= "files") and
    // compare summed bounding-box areas — the proxy for min/max
    // pruning power at equal file count. A power-of-4 run count
    // aligns both curves to perfect quadrant blocks (they tie); real
    // writes are never aligned, so use one that straddles quadrant
    // boundaries — where Morton's jumps blow the boxes up and
    // Hilbert's adjacency keeps them compact.
    def area(index: (Int, Int) => Long): Long = {
      val cells = for (x <- 0 until side; y <- 0 until side)
        yield (index(x, y), x, y)
      val run = (side * side) / 10
      cells.sortBy(_._1).grouped(run).map { g =>
        val xs = g.map(_._2); val ys = g.map(_._3)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      }.sum
    }
    val h = area(BitKernels.hilbert)
    val m = area((x, y) => BitKernels.interleave(x, y))
    assert(h < m, s"hilbert boxes ($h) must beat morton ($m)")
  }

  test("the codegen'd expression matches the kernel and registers in SQL") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    val out = Seq((5, 9), (0, 0), (1000000, 2000000))
      .toDF("x", "y")
      .selectExpr("hilbert_index(x, y) AS h", "x", "y")
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) ==
        BitKernels.hilbert(r.getInt(1), r.getInt(2)))
    }
  }
}
