package graft.expressions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CentroidArgmaxSpec extends SparkSuite {
  import spark.implicits._

  /** The literal-unrolled fold CentroidArgmax replaced — kept here as
    * the semantic reference: array_max over (score, id) structs is a
    * lexicographic max, ties to the larger id.
    */
  private def literalArgmax(x: org.apache.spark.sql.Column,
                            cents: Array[Array[Double]],
                            ids: Array[Int]): org.apache.spark.sql.Column =
    array_max(array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(
        (graft.expressions.VectorDot(x, array(c.toIndexedSeq.map(lit): _*)) -
          lit(c.map(d => d * d).sum / 2.0)).as("score"),
        lit(ids(i)).as("cell"))
    }: _*)).getField("cell")

  private def lcgVecs(n: Int, d: Int): Seq[Array[Double]] =
    (0 until n).map { r =>
      var s = r * 2654435761L + 99
      Array.fill(d) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 33).toDouble / (1L << 31).toDouble - 0.5
      }
    }

  test("bit-identical to the literal-unrolled fold on double vectors") {
    val cents = lcgVecs(16, 8).toArray
    val df = lcgVecs(300, 8).map(v => Tuple1(v)).toDF("v")
    val ids = cents.indices.toArray
    val got = df.select(CentroidArgmax(col("v"), cents).as("c")).collect().map(_.getInt(0))
    val ref = df.select(literalArgmax(col("v"), cents, ids).as("c")).collect().map(_.getInt(0))
    assert(got.toSeq == ref.toSeq)
  }

  test("float input widens exactly; assignment matches the double path") {
    val cents = lcgVecs(8, 4).toArray
    val vecs = lcgVecs(100, 4)
    val fdf = vecs.map(v => Tuple1(v.map(_.toFloat))).toDF("v")
    val ddf = vecs.map(v => Tuple1(v)).toDF("v")
    val got = fdf.select(CentroidArgmax(col("v"), cents).as("c")).collect().map(_.getInt(0))
    val ref = ddf.select(CentroidArgmax(col("v"), cents).as("c")).collect().map(_.getInt(0))
    assert(got.toSeq == ref.toSeq)
  }

  test("exact score ties resolve to the largest id (duplicate centroids)") {
    val c = Array(1.0, 0.0)
    val cents = Array(c, Array(0.0, 1.0), c.clone()) // 0 and 2 identical
    val df = Seq(Tuple1(Array(1.0, 0.0))).toDF("v")
    val got = df.select(CentroidArgmax(col("v"), cents).as("c")).head().getInt(0)
    assert(got == 2)
    // explicit non-contiguous ids: the ID, not the position, wins ties
    val got2 = df.select(
      CentroidArgmax(col("v"), cents, Array(7, 3, 5)).as("c")).head().getInt(0)
    assert(got2 == 7)
  }

  test("interpreted eval agrees with codegen") {
    val cents = lcgVecs(6, 5).toArray
    val vecs = lcgVecs(50, 5)
    val df = vecs.map(v => Tuple1(v)).toDF("v")
    val viaPlan = df.select(CentroidArgmax(col("v"), cents).as("c"))
      .collect().map(_.getInt(0))
    val halfs = cents.map(c => c.map(d => d * d).sum / 2.0)
    val brute = vecs.map { v =>
      val scores = cents.map(c => c.zip(v).map { case (a, b) => a * b }.sum)
      // same rule: strictly-better score, or equal score with larger id
      var best = Double.NegativeInfinity; var bid = Int.MinValue
      for (i <- cents.indices) {
        val s = scores(i) - halfs(i)
        if (s > best || (s == best && i > bid)) { best = s; bid = i }
      }
      bid
    }
    assert(viaPlan.toSeq == brute.toSeq)
  }

  test("mismatched vector length fails loudly") {
    val cents = Array(Array(1.0, 2.0, 3.0))
    val df = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val e = intercept[Exception] {
      df.select(CentroidArgmax(col("v"), cents).as("c")).collect()
    }
    assert(e.getMessage != null)
  }
}
