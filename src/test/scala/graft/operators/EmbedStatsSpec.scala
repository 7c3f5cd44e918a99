package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

class EmbedStatsSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic pseudo-random float vectors (LCG), d=6. */
  private def vecs(n: Int, d: Int = 6): DataFrame = {
    val rows = (0 until n).map { r =>
      var s = r * 2654435761L + 17
      val v = Array.fill(d) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toDouble / (1L << 31).toDouble - 0.5).toFloat
      }
      (r.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def brute(rows: Array[Array[Double]]): Array[Array[Double]] = {
    val n = rows.length
    val d = rows.head.length
    val mu = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      rows.map(r => r(i) * r(j)).sum / n - mu(i) * mu(j))
  }

  test("covMatrix matches brute-force within quantization tolerance") {
    val df = vecs(200)
    val a = EmbedStats.covMatrix(df)
    val b = brute(df.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray))
    for (i <- a.indices; j <- a.indices)
      assert(math.abs(a(i)(j) - b(i)(j)) < 1e-6,
        s"cov($i,$j): ${a(i)(j)} vs ${b(i)(j)}")
    // symmetry is structural (upper triangle mirrored)
    for (i <- a.indices; j <- a.indices)
      assert(a(i)(j) == a(j)(i))
  }

  test("pairSums/dimSums are partitioning-invariant (decimal sums)") {
    val df = vecs(100)
    def sig(d: DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(sig(EmbedStats.pairSums(df)) == sig(EmbedStats.pairSums(df.repartition(7))))
    assert(sig(EmbedStats.dimSums(df)) == sig(EmbedStats.dimSums(df.repartition(7))))
  }

  test("power iteration recovers a known leading eigenpair") {
    // A = [[2,1],[1,2]]: eigenvalues 3 and 1, leading vector (1,1)/√2
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (lambda, v) = EmbedStats.topEigen(a)
    assert(math.abs(lambda - 3.0) < 1e-8)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-6)
    assert(EmbedStats.residual(a, lambda, v) < 1e-8)
  }

  test("labelDimStats: per-class centroid and variance on a controlled set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // label 0: dim0 values {1, 3} -> mean 2, var 1; dim1 {0, 0} -> 0, 0
    // label 1: single vector -> mean = value, var 0
    val df = Seq(
      (0, Array(1.0f, 0.0f)),
      (0, Array(3.0f, 0.0f)),
      (1, Array(-2.0f, 0.5f))
    ).toDF("label", "embedding")
    val out = EmbedStats.labelDimStats(df, "label")
      .select(col("label"), col("i"),
        EmbedStats.meanCol(col("sx"), col("n")).as("m"),
        EmbedStats.varCol(col("sxx"), col("sx"), col("n")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out((0L, 0L)) == ((2.0, 1.0)))
    assert(out((0L, 1L)) == ((0.0, 0.0)))
    assert(out((1L, 0L)) == ((-2.0, 0.0)))
    assert(out((1L, 1L)) == ((0.5, 0.0)))
  }

  test("Rayleigh bound holds on real fixture covariance: λ1 >= max var") {
    val a = EmbedStats.covMatrix(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val (lambda, v) = EmbedStats.topEigen(a)
    val maxVar = a.indices.map(i => a(i)(i)).max
    assert(lambda >= maxVar - 1e-9, s"λ=$lambda maxVar=$maxVar")
    assert(EmbedStats.residual(a, lambda, v) <= 1e-6)
  }
}
