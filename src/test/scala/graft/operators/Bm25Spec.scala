package graft.operators

import graft.SparkSuite
import graft.expressions.{TextHashing, TokenCount}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Bm25Spec extends SparkSuite {

  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("tokenCount kernel: whole-token matches only, boundaries included") {
    assert(TextHashing.tokenCount(u("a b a c a"), u("a")) == 3L)
    assert(TextHashing.tokenCount(u("scan scans rescan scan"), u("scan")) == 2L)
    assert(TextHashing.tokenCount(u("x y z"), u("w")) == 0L)
    assert(TextHashing.tokenCount(u("edge"), u("edge")) == 1L) // whole string
    assert(TextHashing.tokenCount(u("a b"), u("a b")) == 0L)   // spaces never match
    assert(TextHashing.tokenCount(u(""), u("")) == 1L)         // one empty token
  }

  test("tokenCount column agrees with the HOF recompute on real corpus text") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .where(col("doc_id") < 100)
    for (term <- Seq("hash", "join", "scan")) {
      val bad = docs.select(
          TokenCount(col("text"), lit(term)).as("k"),
          size(filter(split(col("text"), " "), t => t === lit(term)))
            .cast("long").as("h"))
        .where(col("k") =!= col("h")).count()
      assert(bad == 0L, s"kernel vs HOF mismatch for '$term'")
    }
  }

  test("NULL text propagates to NULL count (no phantom zero)") {
    val r = Seq((1L, null: String)).toDF("id", "text")
      .select(TokenCount(col("text"), lit("a"))).head()
    assert(r.isNullAt(0))
  }

  test("fitStats is invariant under repartitioning (exact integers + one division)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val terms = Seq("hash", "join", "scan")
    val a = Bm25.fitStats(docs, "text", terms)
    val b = Bm25.fitStats(docs.repartition(7), "text", terms)
    assert(a == b)
    assert(a.n == 500L && a.df.forall(d => d > 0 && d < a.n))
    // the non-negative Lucene idf form
    assert(a.idf.forall(_ > 0.0))
  }

  test("topK scores are bit-identical to a driver-side recompute") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val terms = Seq("hash", "join", "scan")
    val st = Bm25.fitStats(docs, "text", terms)
    val p = Bm25.Params()
    val got = Bm25.topK(docs, "doc_id", "text", terms, st, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    // reference: score every doc in plain Scala with the same fold order
    val all = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val dl = toks.length.toDouble
      val score = terms.zipWithIndex.map { case (tm, i) =>
        val tf = toks.count(_ == tm).toDouble
        st.idf(i) * ((tf * (p.k1 + 1.0)) /
          (tf + p.k1 * ((1.0 - p.b) + (p.b * dl) / st.avgdl)))
      }.reduce(_ + _)
      (r.getLong(0), score)
    }
    val expect = all.filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.toSeq == expect.toSeq)
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
  }

  test("rank is dense 1..k with the score-then-id ordering") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val terms = Seq("hash")
    val st = Bm25.fitStats(docs, "text", terms)
    val rows = Bm25.topK(docs, "doc_id", "text", terms, st, k = 7)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 7L))
  }

  test("stats/term arity mismatch fails loudly") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val st = Bm25.fitStats(docs, "text", Seq("a"))
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq("a", "b"), st, k = 5)
    }
  }
}
