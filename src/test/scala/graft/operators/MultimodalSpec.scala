package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("media table carries binary payload + typed metadata") {
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema("payload").dataType == BinaryType)
    val row = media.head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(row.getAs[String]("fmt") == "txt")
  }

  test("resample keeps every stride-th byte; stride 1 is identity") {
    val docs = Seq((1L, "abcdefg"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    val out = Multimodal.resample(media, stride = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (new String(r.getAs[Array[Byte]]("resized"), "UTF-8"), r.getAs[Long]("resized_bytes")))
      .toMap
    assert(out(1L) == (("adg", 3L)))
    assert(out(2L) == (("", 0L)))
    val id = Multimodal.resample(media, stride = 1).collect()
      .map(r => new String(r.getAs[Array[Byte]]("resized"), "UTF-8")).toSet
    assert(id == Set("abcdefg", ""))
  }

  test("stub decode is deterministic and byte-derived") {
    val docs = Seq((1L, "hello"), (2L, "hello"), (3L, "other")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMediaTable(docs))
      .collect().map(f => f.doc_id -> (f.n_bytes, f.width, f.height, f.checksum)).toMap
    assert(feats(1L) == feats(2L))
    assert(feats(1L) != feats(3L))
    assert(feats(1L)._1 == 5L)
    // matches the local stub applied to the same bytes
    val (w, h, crc) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert(feats(1L) == ((5L, w, h, crc)))
  }

  test("dHash: identical payloads collide at hamming 0; kernel matches column") {
    val text = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.asMediaTable(docs),
      "doc_id", "payload").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L &&
      pairs.head.getLong(2) == 0L)
    // column kernel == plain-JVM kernel on the same bytes
    val viaCol = Multimodal.asMediaTable(docs.limit(1))
      .select(Multimodal.diffHash(col("payload"))).collect().head.getLong(0)
    assert(viaCol ==
      graft.expressions.MediaKernels.diffHash64(text.getBytes("UTF-8")))
  }

  test("dHash: a same-length in-place overlay stays within hamming 3") {
    val rnd = new scala.util.Random(11)
    val base = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val overlaid = base.substring(0, 150) + "WATERMARK!" + base.substring(160)
    assert(overlaid.length == base.length)
    val docs = Seq((1L, base), (2L, overlaid)).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.asMediaTable(docs),
      "doc_id", "payload").collect()
    assert(pairs.length == 1, "overlay pair must be detected")
    assert(pairs.head.getLong(2) <= 3L)
  }

  test("dHash: payloads shorter than the cell count are excluded") {
    val docs = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.asMediaTable(docs),
      "doc_id", "payload").collect()
    assert(pairs.isEmpty)
  }

  test("dHash oversized-bucket cap drops the flooded bucket loudly") {
    // 40 identical payloads -> one bucket of 40; cap 10 drops them all
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 4).trim
    val docs = (1L to 40L).map(i => (i, text)).toDF("doc_id", "text")
    val capped = Multimodal.phashPairs(Multimodal.asMediaTable(docs),
      "doc_id", "payload", maxBucket = Some(10L)).collect()
    assert(capped.isEmpty)
    val uncapped = Multimodal.phashPairs(Multimodal.asMediaTable(docs),
      "doc_id", "payload").collect()
    assert(uncapped.length == 40 * 39 / 2)
  }
}
