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
}
