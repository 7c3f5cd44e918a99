package graft.operators

import graft.SparkSuite

class HybridRetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def ranked(rs: (Long, Long)*) = rs.toSeq.toDF("id", "rank")

  test("doc in both lists outranks docs in one; missing rank is NULL") {
    val a = ranked(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = ranked(2L -> 1L, 4L -> 2L)
    val out = HybridRetrieval.rrf2(a, b, "id", "rank", topK = 10)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3), r.getLong(4)))
    // doc 2: 1/62 + 1/61 beats doc 1: 1/61 alone
    assert(out.head._1 == 2L && out.head._5 == 1L)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    val doc4 = out.find(_._1 == 4L).get
    assert(doc4._2.isEmpty && doc4._3.contains(2L), s"doc4 ranks: $doc4")
  }

  test("rrf scores are the exact two-term sums") {
    val a = ranked(7L -> 1L)
    val b = ranked(7L -> 3L)
    val score = HybridRetrieval.rrf2(a, b, "id", "rank", topK = 1)
      .head().getDouble(3)
    assert(score == 1.0 / 61 + 1.0 / 63)
  }

  test("equal scores tie-break by id") {
    val a = ranked(5L -> 1L, 9L -> 2L)
    val b = ranked(9L -> 1L, 5L -> 2L)
    val out = HybridRetrieval.rrf2(a, b, "id", "rank", topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(out.sameElements(Array((5L, 1L), (9L, 2L))))
  }

  test("topK truncates after fusion") {
    val a = ranked((1L to 10L).map(i => i -> i): _*)
    val b = ranked()
    assert(HybridRetrieval.rrf2(a, b, "id", "rank", topK = 4).count() == 4)
  }
}
