package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PqAnnSpec extends SparkSuite {

  private lazy val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
  private val p = PqAnn.Params(m = 8, ksub = 16, iterations = 3)

  test("codebooks have m x ksub x dsub shape and are bit-identical across partitionings") {
    def fit(parts: Int) =
      PqAnn.fitCodebooks(emb.repartition(parts), "vec_id", "embedding", p)
        .map(_.map(_.toSeq).toSeq).toSeq
    val a = fit(1)
    assert(a.length == p.m)
    assert(a.forall(_.length == p.ksub))
    assert(a.forall(_.forall(_.length == 64 / p.m)))
    assert(a == fit(13), "exact decimal sums must make codebooks partition-invariant")
  }

  test("encode packs m valid 4-bit cells per vector, deterministically") {
    val cbs = PqAnn.fitCodebooks(emb, "vec_id", "embedding", p)
    val codes = PqAnn.encode(emb, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes.size == emb.count())
    codes.values.foreach { code =>
      assert(code >= 0L && code < (1L << (4 * p.m)))
      (0 until p.m).foreach { s =>
        assert(((code >> (4 * s)) & 15L) < p.ksub)
      }
    }
    val again = PqAnn.encode(emb, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes == again)
  }

  test("topK is well-formed: no self-matches, contiguous ranks per query") {
    val out = PqAnn.topK(emb.where(col("vec_id") < 5), emb, k = 5, p = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.forall { case (q, n, _) => q != n })
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.size.toLong))
    }
  }
}
