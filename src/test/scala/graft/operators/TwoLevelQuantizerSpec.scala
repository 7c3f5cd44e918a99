package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TwoLevelQuantizerSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 4
  // 12 deterministic pseudo-random centroids
  private val centroids: Array[Array[Double]] = Array.tabulate(12) { i =>
    Array.tabulate(dim)(d => math.sin(i * 7 + d * 3).abs + 0.1 * i)
  }

  test("group(): members partition the cell ids, ascending, no empties") {
    val g = TwoLevelQuantizer.group(centroids, superK = 4)
    val all: Seq[Int] = g.members.toIndexedSeq.flatMap(_.toIndexedSeq).sorted
    assert(all == centroids.indices.toIndexedSeq,
      "members must partition 0..k-1 exactly once")
    g.members.foreach { m =>
      assert(m.nonEmpty && m.sameElements(m.sorted))
    }
    assert(g.superCentroids.length == g.members.length)
  }

  test("plan-side assignment matches the driver-side reference semantics") {
    val g = TwoLevelQuantizer.group(centroids, superK = 4)
    def score(v: Array[Double], c: Array[Double]): Double =
      v.zip(c).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2.0
    def refAssign(v: Array[Double]): Int = {
      // ties to the higher index at BOTH levels
      val sup = g.superCentroids.indices.maxBy(j =>
        (score(v, g.superCentroids(j)), j))
      g.members(sup).maxBy(c => (score(v, centroids(c)), c))
    }
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.tabulate(dim)(d => math.cos(i * 13 + d * 5).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .withColumn("sup", TwoLevelQuantizer.superExpr(col("v"), g))
      .withColumn("cell",
        TwoLevelQuantizer.cellExpr(col("v"), centroids, g, col("sup")))
    val got = df.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, emb) =>
      val expected = refAssign(emb.map(_.toDouble).toArray)
      assert(got(id) == expected, s"vec $id: got ${got(id)}, want $expected")
    }
  }

  test("SemDedup twoLevel equals flat on well-separated groups") {
    val fixture = Seq(
      1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f),
      4L -> Seq(0.999f, 0.01f, 0f), 5L -> Seq(0.998f, 0.02f, 0f),
      11L -> Seq(0.01f, 0.999f, 0f)).toDF("vec_id", "embedding")
    val p = SemDedup.Params(k = 3, iterations = 2, trainFraction = 1.0,
      tau = 0.95)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().sorted.toSeq
    val flat = ids(SemDedup.survivors(fixture, p = p))
    val fast = ids(SemDedup.survivors(fixture, p = p.copy(twoLevel = true)))
    assert(flat == fast && flat == Seq(1L, 2L, 3L))
  }

  test("two-level survivors: no quadratic join in the plan") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val p = SemDedup.Params(k = 8, iterations = 1, tau = 0.45, twoLevel = true)
    val plan = SemDedup.survivors(emb, p = p)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
