package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextChunkSpec extends SparkSuite {

  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int) =
    TextChunk.transform(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_tokens"),
        r.getAs[String]("chunk_text")))

  test("100 tokens, size 64 stride 48: starts 0/48/96, short tail window") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 64, 48)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(got.map(_._2).toSeq == Seq(64L, 52L, 4L))
    assert(got(0)._3.startsWith("t0 t1 ") && got(0)._3.endsWith(" t63"))
    assert(got(1)._3.startsWith("t48 ") && got(1)._3.endsWith(" t99"))
    assert(got(2)._3 == "t96 t97 t98 t99")
  }

  test("consecutive windows overlap by size - stride tokens") {
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 64, 48)
    val w0 = got(0)._3.split(" ").toSeq
    val w1 = got(1)._3.split(" ").toSeq
    assert(w0.takeRight(16) == w1.take(16)) // 64 - 48 = 16 shared tokens
  }

  test("document shorter than one window yields exactly one full-coverage chunk") {
    val got = chunksOf("a b c", 64, 48)
    assert(got.toSeq == Seq((0L, 3L, "a b c")))
  }

  test("NULL text yields no chunk rows (no phantom window)") {
    // without the null filter, greatest(size(NULL)-1,0)=0 emits one
    // start and least(size, NULL)=size produces (0, 64, NULL) — a
    // phantom row the DuckDB oracle (range over NULL) never emits
    val got = TextChunk.transform(
      Seq((1L, null: String), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", 64, 48).collect()
    assert(got.length == 1 && got.head.getAs[Long]("doc_id") == 2L, got.toSeq)
  }

  test("stride == size is non-overlapping exact partitioning") {
    val text = (0 until 96).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, 48, 48)
    assert(got.map(_._2).toSeq == Seq(48L, 48L))
    assert(got.flatMap(_._3.split(" ")).toSeq == text.split(" ").toSeq)
  }

  test("every source token is covered by at least one chunk (no boundary loss)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .where(col("doc_id") < 50)
    val chunked = TextChunk.transform(docs, "doc_id", "text", 64, 48)
    // independent recomputation from the raw text: chunk count is
    // floor((ntok-1)/48)+1 (start offsets 0,48,.. < ntok), every
    // window holds min(64, ntok - 48*idx) tokens, and window ordinals
    // are dense — together these pin full coverage with no boundary
    // loss and no phantom windows
    val perChunk = chunked.join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok")), "doc_id")
    val badTok = perChunk.where(
      col("chunk_tokens") =!= least(lit(64L), col("ntok") - col("chunk_idx") * 48))
    assert(badTok.count() == 0, badTok.collect().take(3).mkString("; "))
    val perDoc = chunked.groupBy("doc_id")
      .agg(max("chunk_idx").as("last"), count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok")), "doc_id")
    val badCnt = perDoc.where(
      col("n") =!= col("last") + 1 ||
        col("n") =!= floor((col("ntok") - 1) / 48) + 1)
    assert(badCnt.count() == 0, badCnt.collect().take(3).mkString("; "))
  }

  test("invalid size/stride are rejected") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextChunk.transform(df, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextChunk.transform(df, "doc_id", "text", 10, 11)
    }
    intercept[IllegalArgumentException] {
      TextChunk.transform(df, "doc_id", "text", 10, 0)
    }
  }
}
