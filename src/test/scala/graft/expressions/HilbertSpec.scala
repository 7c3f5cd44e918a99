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

  test("hilbertN is a bijection with unit-step adjacency in 3-D and 4-D") {
    // the two properties that MAKE a curve a Hilbert curve, checked
    // exhaustively over the full domain at small orders: every index
    // in [0, 2^(n·bits)) is hit exactly once, and consecutive
    // indexes differ by exactly 1 in exactly one coordinate
    for ((n, bits) <- Seq((3, 3), (4, 2))) {
      val sideN = 1 << bits
      val total = 1L << (n * bits)
      val pos = new Array[Array[Long]](total.toInt)
      def walk(prefix: List[Long]): Unit =
        if (prefix.length == n) {
          val c = prefix.reverse.toArray
          val h = BitKernels.hilbertN(c, bits)
          assert(h >= 0 && h < total, s"index $h out of range (n=$n)")
          assert(pos(h.toInt) == null,
            s"index $h hit twice (n=$n): ${c.toSeq}")
          pos(h.toInt) = c
        } else (0 until sideN).foreach(v => walk(v.toLong :: prefix))
      walk(Nil)
      (1 until total.toInt).foreach { d =>
        val a = pos(d - 1); val b = pos(d)
        val dist = a.indices.map(i => math.abs(a(i) - b(i))).sum
        assert(dist == 1,
          s"n=$n step $d jumps ${a.toSeq} -> ${b.toSeq} (dist $dist)")
      }
    }
  }

  test("hilbert3/hilbert4 expressions match the kernel and register " +
      "in SQL") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    val rows3 = Seq((5, 9, 12), (0, 0, 0), (65535, 1, 32000))
      .toDF("x", "y", "z")
      .selectExpr("hilbert3(x, y, z, 16) AS h", "x", "y", "z").collect()
    rows3.foreach { r =>
      assert(r.getLong(0) == BitKernels.hilbertN(
        Array(r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong),
        16))
    }
    val rows4 = Seq((5, 9, 12, 7), (0, 0, 0, 0), (32767, 1, 9, 32000))
      .toDF("x", "y", "z", "w")
      .selectExpr("hilbert4(x, y, z, w, 15) AS h", "x", "y", "z", "w")
      .collect()
    rows4.foreach { r =>
      assert(r.getLong(0) == BitKernels.hilbertN(
        Array(r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong,
          r.getInt(4).toLong), 15))
    }
  }

  test("3-D hilbert ranges cover tighter boxes than 3-D morton") {
    // the same equal-run bounding-volume proxy as the 2-D locality
    // test, one dimension up: summed per-run bounding-box VOLUMES at
    // equal run count — what per-file min/max pruning sees
    val s3 = 16; val bits3 = 4
    def volume(index: (Int, Int, Int) => Long): Long = {
      val cells = for (x <- 0 until s3; y <- 0 until s3; z <- 0 until s3)
        yield (index(x, y, z), x, y, z)
      val run = (s3 * s3 * s3) / 10
      cells.sortBy(_._1).grouped(run).map { g =>
        def ext(f: ((Long, Int, Int, Int)) => Int) =
          (g.map(f).max - g.map(f).min + 1).toLong
        ext(_._2) * ext(_._3) * ext(_._4)
      }.sum
    }
    val h = volume((x, y, z) =>
      BitKernels.hilbertN(Array(x.toLong, y.toLong, z.toLong), bits3))
    val m = volume((x, y, z) => {
      // 3-D morton at bits3 bits — the round-robin interleave
      var v = 0L
      for (i <- 0 until bits3; (c, d) <- Seq(x, y, z).zipWithIndex)
        v |= ((c.toLong >> i) & 1L) << (i * 3 + d)
      v
    })
    assert(h < m, s"3-D hilbert boxes ($h) must beat morton ($m)")
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
