package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {

  private lazy val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")

  test("brute-force top-k matches a driver-side exact computation") {
    val got = Similarity.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("nid")))
      .toSet

    // exact oracle computed locally
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dotp = a.zip(b).map { case (x, y) => x * y }.sum
      dotp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = (0L until 3L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(5).zipWithIndex
        .map { case ((n, _), i) => (q, (i + 1).toLong, n) }
    }.toSet
    assert(got == want)
  }

  test("LSH top-k returns valid ranked neighbors and is deterministic") {
    val a = RandomHyperplaneLSH.topK(emb.where(col("vec_id") < 5), emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = RandomHyperplaneLSH.topK(emb.where(col("vec_id") < 5), emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall { case (q, n, r) => q != n && r >= 1 && r <= 5 })
    // per query at most k neighbors, ranks contiguous from 1
    a.groupBy(_._1).foreach { case (_, rows) =>
      val ranks = rows.map(_._3).toSeq.sorted
      assert(ranks == (1L to ranks.size.toLong))
    }
  }

  test("brute-force plan broadcasts the query side (no corpus shuffle before scoring)") {
    val df = Similarity.bruteForceTopK(emb.where(col("vec_id") < 3), emb, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan:\n$plan")
  }

  test("nearDupPairs bucket cap drops the degenerate all-identical bucket, generous cap is a no-op") {
    import spark.implicits._
    // 6 identical vectors land in ONE bucket per table — the degenerate
    // corpus the cap exists for
    val df = (1L to 6L).map(i => (i, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    def n(cap: Option[Long]) =
      RandomHyperplaneLSH.nearDupPairs(df, threshold = 0.5, maxBucket = cap).count()
    assert(n(None) == 15L) // 6 choose 2
    assert(n(Some(3L)) == 0L)
    assert(n(Some(50L)) == 15L)
  }
}
