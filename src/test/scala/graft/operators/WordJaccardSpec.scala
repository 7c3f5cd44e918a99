package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WordJaccardSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("a cap above the corpus max df is bit-identical to uncapped") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").where(col("doc_id") < 50)
    val capped = rows(WordJaccard.pairStats(docs, "doc_id", "text", maxDocFreq = 1000L))
    val uncapped = rows(WordJaccard.pairStats(docs, "doc_id", "text", maxDocFreq = Long.MaxValue))
    assert(capped == uncapped)
    assert(capped.nonEmpty)
  }

  test("tokens beyond the df cap are pruned from join AND set sizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hot alpha beta"),
      (2L, "hot alpha beta"),
      (3L, "hot gamma delta"),
      (4L, "hot epsilon zeta")
    ).toDF("doc_id", "text")
    // df("hot") = 4 > cap 3 -> pruned: pairs sharing ONLY the hot token
    // disappear, and the surviving pair's stats count capped vocabulary
    val capped = rows(WordJaccard.pairStats(docs, "doc_id", "text", maxDocFreq = 3L))
    assert(capped == Set((1L, 2L, 2L, 2L)))
    // uncapped keeps all 6 pairs (every pair shares "hot")
    val uncapped = rows(WordJaccard.pairStats(docs, "doc_id", "text", maxDocFreq = 100L))
    assert(uncapped.size == 6)
    assert(uncapped.contains((1L, 2L, 3L, 3L)))
  }
}
