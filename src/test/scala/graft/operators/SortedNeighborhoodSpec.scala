package graft.operators

import graft.SparkSuite

class SortedNeighborhoodSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], w: Int,
                    num: Int = 1, den: Int = 2) =
    SortedNeighborhood.nearDupPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", w, num, den)
      .collect()
      .map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")),
        (r.getAs[Long]("inter"), r.getAs[Long]("uni"))))
      .toMap

  test("only rank-adjacent pairs within the window are compared") {
    // sort order by text: "a ..."(1) < "a ..."(2) < "m ..."(3) < "z ..."(4)
    // near-dups 1 and 2 are adjacent; 1 and 4 are 3 apart
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "m n o p"),
      (4L, "z b c d"))
    val w1 = pairs(docs, w = 1)
    // window 1: (1,2) adjacent, jaccard 3/5 >= 1/2 kept; (2,3), (3,4)
    // adjacent but jaccard 0 dropped by threshold
    assert(w1.keySet == Set((1L, 2L)), w1)
    assert(w1((1L, 2L)) == ((3L, 5L)))
    // window 3 reaches (1,4): jaccard 3/5 — found despite distance 3;
    // (2,4) is also compared but drops at jaccard 2/6 < 1/2
    val w3 = pairs(docs, w = 3)
    assert(w3.keySet == Set((1L, 2L), (1L, 4L)), w3)
    assert(pairs(docs, w = 3, num = 1, den = 3).keySet.contains((2L, 4L)))
  }

  test("pair orientation is a < b even when sort order reverses ids") {
    // doc 9's text sorts BEFORE doc 1's, so the rank pair is (9, 1) —
    // output must still be a=1, b=9
    val docs = Seq((9L, "a a a a"), (1L, "a a a b"))
    val out = pairs(docs, w = 1, num = 0, den = 1) // keep all
    assert(out.keySet == Set((1L, 9L)), out)
  }

  test("threshold is exact integer cross-multiplication") {
    val docs = Seq((1L, "a b c d"), (2L, "a b e f"))
    // distinct sets {a,b,c,d} vs {a,b,e,f}: inter=2, uni=6 -> 1/3
    assert(pairs(docs, w = 1, num = 1, den = 3).keySet == Set((1L, 2L)))
    assert(pairs(docs, w = 1, num = 1, den = 2).isEmpty)
  }

  test("plan: no cartesian/nested-loop; candidates join on rank equality") {
    val df = SortedNeighborhood.nearDupPairs(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "doc_id", "text", 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"plan:\n$plan")
  }
}
