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
