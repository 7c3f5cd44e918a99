package graft.operators

import graft.SparkSuite

class SetSimJoinSpec extends SparkSuite {
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): Double =
    (a intersect b).size.toDouble / (a union b).size

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("lossless: prefix-filtered pairs equal brute-force thresholded pairs") {
    // deterministic pseudo-random corpus with planted overlaps
    val rng = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"t$i")
    val base = (0 until 30).map(_ =>
      rng.shuffle(vocab).take(8 + rng.nextInt(8)))
    // half the docs get a mutated copy (1-3 token swaps) — real near-dups
    val texts = (base ++ base.take(15).map { toks =>
      val drop = 1 + rng.nextInt(3)
      toks.drop(drop) ++ rng.shuffle(vocab).take(drop)
    }).map(_.mkString(" "))
    val df = docsOf(texts)
    for ((tn, td) <- Seq((1, 2), (4, 5), (7, 10))) {
      val got = SetSimJoin.pairs(df, "doc_id", "text", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = texts.map(_.split(" ").toSet)
      val expected = (for {
        a <- sets.indices; b <- sets.indices if a < b
        if jaccard(sets(a), sets(b)) >= tn.toDouble / td
      } yield (a.toLong, b.toLong)).toSet
      assert(got == expected, s"tau=$tn/$td: got ${got.size}, expected ${expected.size}")
    }
  }

  test("tau = 1 matches exactly the identical token sets (order-insensitive)") {
    val df = docsOf(Seq("a b c", "c b a", "a b d", "a b c d"))
    val got = SetSimJoin.pairs(df, "doc_id", "text", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }

  test("intersection and union counts are exact integers") {
    val df = docsOf(Seq("a b c d e", "a b c d f"))
    val row = SetSimJoin.pairs(df, "doc_id", "text", 1, 2).collect().head
    assert(row.getLong(2) == 4L && row.getLong(3) == 6L)
  }

  test("the prefix join never touches a document's common tail") {
    // one universally-hot token; prefix tokens must be the rare ones
    val df = docsOf((0 until 20).map(i => s"hot rare$i other$i"))
    // no pair passes tau=1/2 (each pair shares only 'hot': j = 1/5)
    assert(SetSimJoin.pairs(df, "doc_id", "text", 1, 2).count() == 0)
    // and candidate generation itself stays tiny: with prefix length
    // n - ceil(n/2) + 1 = 2 of 3 tokens ordered rarest-first, 'hot'
    // (df=20) is every doc's LAST token — outside every prefix, so
    // zero candidate pairs form at all (the hot-tail immunity that
    // the df-capped WordJaccard buys with recall loss)
    val plan = SetSimJoin.pairs(df, "doc_id", "text", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("invalid tau is rejected") {
    val df = docsOf(Seq("a b"))
    intercept[IllegalArgumentException](SetSimJoin.pairs(df, "doc_id", "text", 0, 2))
    intercept[IllegalArgumentException](SetSimJoin.pairs(df, "doc_id", "text", 3, 2))
  }
}
