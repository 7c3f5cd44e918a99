package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextPackSpec extends SparkSuite {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  private lazy val packed = {
    val chunks = TextChunk.transform(docs, "doc_id", "text", 64, 48)
      .withColumn("shard", pmod(Sampling.hashValue(col("doc_id")), lit(4L)))
    TextPack.pack(chunks, "shard", Seq("doc_id", "chunk_idx"),
      "chunk_tokens", binTokens = 256L)
  }

  test("bin_offset is the running token offset and bins advance at capacity") {
    // recompute the running sum independently and check bin/bin_offset
    // are exactly (before div 256, before % 256)
    val rows = packed.select("shard", "doc_id", "chunk_idx", "chunk_tokens",
        "bin", "bin_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    for ((_, shardRows) <- rows) {
      var before = 0L
      for ((_, _, _, tok, bin, off) <- shardRows.sortBy(r => (r._2, r._3))) {
        assert(bin == before / 256 && off == before % 256,
          s"expected bin=${before / 256} off=${before % 256}, got $bin/$off")
        before += tok
      }
    }
  }

  test("every non-final bin lands within one chunk of capacity") {
    val totals = packed.groupBy("shard", "bin")
      .agg(sum("chunk_tokens").as("tok"))
    val lastBin = packed.groupBy("shard").agg(max("bin").as("last"))
    val bad = totals.join(lastBin, "shard")
      .where(col("bin") < col("last") &&
        (col("tok") < 256 - 63 || col("tok") > 256 + 63))
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }

  test("chunks never split: each (doc, chunk) appears exactly once") {
    assert(packed.count() ==
      TextChunk.transform(docs, "doc_id", "text", 64, 48).count())
    assert(packed.select("doc_id", "chunk_idx").distinct().count() ==
      packed.count())
  }

  test("packing is reproducible and independent of input partitioning") {
    val chunks = TextChunk.transform(docs, "doc_id", "text", 64, 48)
      .withColumn("shard", pmod(Sampling.hashValue(col("doc_id")), lit(4L)))
    val again = TextPack.pack(chunks.repartition(13),
        "shard", Seq("doc_id", "chunk_idx"), "chunk_tokens", 256L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(again == packed.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, 0L, 3L)).toDF("shard", "idx", "tok")
    intercept[IllegalArgumentException](
      TextPack.pack(df, "shard", Seq("idx"), "tok", 0L))
    intercept[IllegalArgumentException](
      TextPack.pack(df, "shard", Seq.empty, "tok", 8L))
  }
}
