package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contract of the chunk → pack assembly line, driven
  * by seeded scalacheck generators (sampled manually — same offline
  * rationale as TopNPropertiesSpec): for any corpus, chunkSize, stride
  * and binTokens —
  *  - chunk count per doc = floor((ntok-1)/stride)+1, ordinals dense
  *  - token coverage: window i spans [i*stride, i*stride+chunk_tokens)
  *    with chunk_tokens = min(chunkSize, ntok - i*stride) — no token
  *    beyond chunkSize of a boundary is lost, no phantom windows
  *  - pack: bin/bin_offset equal an independent sequential replay of
  *    the per-shard running sum (whole-chunk assignment, no splits)
  */
class ChunkPackPropertiesSpec extends SparkSuite {

  private val caseGen: Gen[(List[Int], Int, Int, Long)] = for {
    nDocs <- Gen.chooseNum(1, 12)
    toks <- Gen.listOfN(nDocs, Gen.chooseNum(1, 200))
    chunkSize <- Gen.chooseNum(1, 80)
    stride <- Gen.chooseNum(1, chunkSize)
    binTokens <- Gen.chooseNum(1L, 300L)
  } yield (toks, chunkSize, stride, binTokens)

  private def cases(count: Int): Seq[(List[Int], Int, Int, Long)] =
    (1 to count).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: chunk count, ordinals, window sizes; pack replay (12 seeded cases)") {
    import spark.implicits._
    cases(12).foreach { case (toks, chunkSize, stride, binTokens) =>
      val clue = s"toks=$toks size=$chunkSize stride=$stride bin=$binTokens"
      val docs = toks.zipWithIndex
        .map { case (n, i) => (i.toLong, (0 until n).map(t => s"w$t").mkString(" ")) }
        .toDF("doc_id", "text")
      val chunks = TextChunk.transform(docs, "doc_id", "text", chunkSize, stride)
      val got = chunks.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
          r.getAs[Long]("chunk_tokens"), r.getAs[String]("chunk_text")))
        .groupBy(_._1)

      toks.zipWithIndex.foreach { case (ntok, i) =>
        val mine = got(i.toLong).sortBy(_._2)
        assert(mine.length == (ntok - 1) / stride + 1, clue)
        assert(mine.map(_._2).toSeq == mine.indices.map(_.toLong), clue)
        mine.foreach { case (_, idx, ct, text) =>
          val start = idx * stride
          assert(ct == math.min(chunkSize.toLong, ntok - start), clue)
          val words = text.split(" ")
          assert(words.length == ct, clue)
          assert(words.head == s"w$start" && words.last == s"w${start + ct - 1}", clue)
        }
      }

      // pack with a 3-way shard; replay the running sums sequentially
      val sharded = chunks.withColumn("shard", pmod(col("doc_id"), lit(3L)))
      val packed = TextPack.pack(sharded, "shard", Seq("doc_id", "chunk_idx"),
          "chunk_tokens", binTokens)
        .select("shard", "doc_id", "chunk_idx", "chunk_tokens", "bin", "bin_offset")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      packed.groupBy(_._1).foreach { case (_, rows) =>
        var before = 0L
        rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, ct, bin, off) =>
          assert(bin == before / binTokens && off == before % binTokens, clue)
          before += ct
        }
      }
      assert(packed.length == chunks.count(), clue)
    }
  }
}
