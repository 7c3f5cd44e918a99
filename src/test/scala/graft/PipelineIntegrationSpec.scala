package graft

import graft.functions.{TextFunctions => TF}
import graft.operators._
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline composition over the real corpus:
  * quality filter → exact dedup → near-dup clustering → per-language
  * top-N by quality → ANN enrichment. Exercises the operators the way
  * a user would chain them, not in isolation.
  */
class PipelineIntegrationSpec extends SparkSuite {

  test("full corpus pipeline: filter -> dedup -> cluster -> grouped topN -> ANN join") {
    val dir = sf("sf0.001")
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")

    // 1. quality scoring + filter
    val scored = docs.withColumn("n_tokens", TF.tokenCount(col("text")))
      .withColumn("quality",
        TF.stopwordCount(col("text"), Seq("the", "a", "of")) * lit(1000) / col("n_tokens"))
      .where(col("n_tokens") >= 10)
    assert(scored.count() > 0)

    // 2. exact dedup (no exact dups in corpus -> count preserved)
    val exact = ExactDedup.dropDuplicateContent(scored, "doc_id", "text")
    assert(exact.count() == scored.count())

    // 3. near-dup clustering drops the planted near-dups
    val deduped = NearDupClusters.dropNearDuplicates(exact, "doc_id", "text", 0.8)
    val nDeduped = deduped.count()
    assert(nDeduped < exact.count(), "planted near-dups must be removed")

    // 4. top-3 per language by quality (schema-preserving grouped topN)
    val top = GroupedTopN.transform(
      TopNConfig("quality", 3), Seq("lang"), Seq("doc_id"))(
      deduped.select("doc_id", "lang", "quality"))
    assert(top.groupBy("lang").count().agg(max("count")).head().getLong(0) <= 3)

    // 5. enrich survivors with nearest-neighbor doc ids via ANN
    val queryVecs = emb.join(top.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val neighbors = Similarity.bruteForceTopK(queryVecs, emb, k = 3)
    val enriched = top.join(neighbors,
      top("doc_id") === neighbors("qid"), "left_outer")
    assert(enriched.count() >= top.count())
    // every surviving doc with an embedding got exactly 3 neighbors
    val counts = neighbors.groupBy("qid").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 3))
  }
}
