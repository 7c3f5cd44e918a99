package graft.operators

import graft.SparkSuite

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def toksOf(n: Int, seed: Int) =
    (0 until n).map(i => s"w${(i * 31 + seed * 7919) % 100000}_$seed")

  test("guarantee: a shared run of >= n+w-1 tokens always yields a shared print") {
    val n = 5; val w = 4
    val shared = (0 until n + w - 1).map(i => s"common$i")
    // the shared 8-token run is embedded at different positions in
    // otherwise-disjoint documents
    val a = (toksOf(20, 1) ++ shared ++ toksOf(15, 2)).mkString(" ")
    val b = (toksOf(7, 3) ++ shared ++ toksOf(25, 4)).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ps = Winnow.prints(df, "doc_id", "text", n, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val pA = ps.filter(_._1 == 1L).map(_._2).toSet
    val pB = ps.filter(_._1 == 2L).map(_._2).toSet
    assert((pA intersect pB).nonEmpty,
      "winnowing must keep at least one print from a full shared window")
    val stats = Winnow.sharedStats(df, "doc_id", "text", n, w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) >= 1 && stats(2L) >= 1)
  }

  test("density: winnowing keeps far fewer prints than all-windows hashing") {
    val text = toksOf(500, 9).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val kept = Winnow.prints(df, "doc_id", "text", 5, 4).count().toDouble
    val allShingles = 500 - 5 + 1
    // expected density 2/(w+1) = 0.4; allow slack for distinct-ing
    assert(kept / allShingles < 0.6,
      s"kept $kept of $allShingles shingles — winnowing didn't thin")
    assert(kept > 0)
  }

  test("disjoint documents share no prints") {
    val df = Seq((1L, toksOf(60, 11).mkString(" ")),
      (2L, toksOf(60, 12).mkString(" "))).toDF("doc_id", "text")
    val stats = Winnow.sharedStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats.values.forall(_ == 0L), stats.toString)
  }

  test("short documents (< n+w-1 tokens) emit no prints instead of erroring") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 < 8
    assert(Winnow.prints(df, "doc_id", "text", 5, 4).count() == 0)
  }
}
