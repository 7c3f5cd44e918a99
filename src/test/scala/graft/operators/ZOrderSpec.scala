package graft.operators

import graft.SparkSuite
import graft.expressions.BitKernels
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSuite {

  import spark.implicits._

  /** Reference interleave: the obvious bit loop. */
  private def naive(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x.toLong >> i) & 1L) << (2 * i)
      z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-number interleave equals the bit loop (incl. negatives, high bits)") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 1), (1023, 1023),
      (Int.MaxValue, Int.MinValue), (-1, -1), (65536, 65535)) ++
      Seq.fill(500)((rnd.nextInt(), rnd.nextInt()))
    cases.foreach { case (x, y) =>
      assert(BitKernels.interleave(x, y) == naive(x, y), s"($x, $y)")
    }
  }

  test("x and y bits land on even/odd output positions (invertible)") {
    val rnd = new scala.util.Random(11)
    Seq.fill(100)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16))).foreach {
      case (x, y) =>
        val z = BitKernels.interleave(x, y)
        val backX = (0 until 32).map(i => (((z >> (2 * i)) & 1L) << i).toInt).sum
        val backY = (0 until 32).map(i => (((z >> (2 * i + 1)) & 1L) << i).toInt).sum
        assert(backX == x && backY == y, s"($x, $y) -> $z")
    }
  }

  test("zvalue column matches the kernel; mortonSql covers the bounded domain") {
    val df = (0 until 200).map(i => (i * 37 % 1024, i * 91 % 1024)).toDF("x", "y")
    val bad = df.select(col("x"), col("y"),
        ZOrder.zvalue(col("x").cast("int"), col("y").cast("int")).as("z"))
      .collect().count(r =>
        r.getLong(2) != naive(r.getInt(0), r.getInt(1)))
    assert(bad == 0)
  }

  test("a 4^6-wide z-range bounds BOTH coordinate extents to a 64x64 square") {
    // the property that makes parquet min/max stats prune 2-D range
    // predicates after a z-ordered write
    val pts = graft.Tables(spark, sf("sf0.001"), "lineitem")
      .select(pmod(col("l_partkey"), lit(1024)).cast("int").as("x"),
        pmod(col("l_suppkey"), lit(1024)).cast("int").as("y"))
    val ext = pts.withColumn("z", ZOrder.zvalue(col("x"), col("y")))
      .groupBy(shiftright(col("z"), 12).as("bucket"))
      .agg((max("x") - min("x")).as("xe"), (max("y") - min("y")).as("ye"))
      .agg(max("xe"), max("ye")).head()
    assert(ext.getInt(0) <= 63 && ext.getInt(1) <= 63, ext.toSeq)
  }

  test("layout gives disjoint, internally sorted z-ranges per partition") {
    val pts = graft.Tables(spark, sf("sf0.001"), "lineitem")
      .select(pmod(col("l_partkey"), lit(1024)).cast("int").as("x"),
        pmod(col("l_suppkey"), lit(1024)).cast("int").as("y"))
    val laid = ZOrder.layout(pts, col("x"), col("y"), numFiles = 8)
    assert(laid.columns.toSeq == Seq("x", "y")) // key dropped
    // recompute z from the laid-out rows, tag the partition, check
    // per-partition ranges are disjoint (each "file" = one z-range)
    val ranges = laid
      .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("lo").collect()
    assert(ranges.length > 1 && ranges.map(_.getAs[Long]("n")).sum == pts.count())
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"overlapping z-ranges: ${a.toSeq} vs ${b.toSeq}")
      case _ =>
    }
  }
}
