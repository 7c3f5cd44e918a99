package graft.operators

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contract of paragraph-grain dedup, seeded
  * scalacheck cases (sampled manually — the offline TopNProperties
  * rationale): for any corpus (built from a small alphabet so chunk
  * collisions actually occur) and chunk width —
  *  - GLOBAL UNIQUENESS: across all clean_texts, every distinct chunk
  *    of the input corpus appears EXACTLY once;
  *  - FIRST-WINNER: the surviving occurrence is the (doc_id, idx)
  *    minimum over that chunk's occurrences;
  *  - CONSERVATION: sum(kept_chunks) = number of distinct chunks, and
  *    per doc total_chunks = ceil(words/cw), kept <= total;
  *  - REBUILD: each clean_text equals the original doc's kept chunks
  *    joined in position order.
  */
class ChunkDedupPropertiesSpec extends SparkSuite {

  private val caseGen: Gen[(List[String], Int)] = for {
    nDocs <- Gen.chooseNum(1, 10)
    cw <- Gen.chooseNum(1, 5)
    texts <- Gen.listOfN(nDocs, for {
      nWords <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(nWords, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
  } yield (texts, cw)

  private def cases(count: Int): Seq[(List[String], Int)] =
    (1 to count).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(100L + i)))

  private def chunksOf(text: String, cw: Int): Seq[String] =
    text.split(" ").grouped(cw).map(_.mkString(" ")).toSeq

  test("property: global uniqueness, first-winner, conservation, " +
      "rebuild (10 seeded cases)") {
    import spark.implicits._
    cases(10).foreach { case (texts, cw) =>
      val clue = s"cw=$cw texts=$texts"
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = ChunkDedup.cleanDocs(docs.toDF("doc_id", "text"),
          "doc_id", "text", cw)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((Option(r.getAs[String]("clean_text")),
            r.getAs[Long]("kept_chunks"), r.getAs[Long]("total_chunks"))))
        .toMap

      // reference: first (doc_id, idx) occurrence per distinct chunk
      val occ = docs.flatMap { case (id, t) =>
        chunksOf(t, cw).zipWithIndex.map { case (c, i) => (c, id, i) } }
      val winners = occ.groupBy(_._1).view
        .mapValues(_.minBy(o => (o._2, o._3))).toMap
      val expectedKeep: Map[Long, Seq[(Int, String)]] =
        winners.values.toSeq.map(o => (o._2, o._3, o._1))
          .groupBy(_._1).view
          .mapValues(_.sortBy(_._2).map(o => (o._2, o._3))).toMap

      for ((id, t) <- docs) {
        val (clean, kept, total) = out(id)
        assert(total == chunksOf(t, cw).size.toLong, clue)
        val exp = expectedKeep.getOrElse(id, Seq.empty)
        assert(kept == exp.size.toLong, s"$clue doc=$id")
        val expText = if (exp.isEmpty) None
          else Some(exp.map(_._2).mkString(" "))
        assert(clean == expText, s"$clue doc=$id")
      }
      // global uniqueness + conservation
      val allKept = out.values.flatMap(_._1).flatMap(chunksOf(_, cw)).toSeq
      assert(allKept.size == allKept.distinct.size, clue)
      assert(allKept.toSet == occ.map(_._1).toSet, clue)
      assert(out.values.map(_._2).sum == winners.size.toLong, clue)
    }
  }
}
