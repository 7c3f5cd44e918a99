package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan

class ChunkDedupSpec extends SparkSuite {
  import spark.implicits._

  // 3-word grain; "a b c" / "d e f" are chunks
  private def run(docs: Seq[(Long, String)], cw: Int = 3) =
    ChunkDedup.cleanDocs(docs.toDF("doc_id", "text"), "doc_id", "text", cw)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[String]("clean_text")),
          r.getAs[Long]("kept_chunks"), r.getAs[Long]("total_chunks"))))
      .toMap

  test("first occurrence wins; later copies are cut from their docs") {
    val out = run(Seq(
      (1L, "a b c d e f"),        // keeps both chunks
      (2L, "a b c x y z"),        // chunk "a b c" already seen -> cut
      (3L, "x y z")               // "x y z" first seen in doc 2 -> cut
    ))
    assert(out(1L) == ((Some("a b c d e f"), 2L, 2L)))
    assert(out(2L) == ((Some("x y z"), 1L, 2L)))
    assert(out(3L) == ((None, 0L, 1L)))
  }

  test("duplicate chunk INSIDE one doc keeps only the first position") {
    val out = run(Seq((1L, "a b c a b c d e f")))
    assert(out(1L) == ((Some("a b c d e f"), 2L, 3L)))
  }

  test("ragged tail chunk is its own unit") {
    val out = run(Seq((1L, "a b c d"), (2L, "d")))
    // doc 1 = ["a b c", "d"]; doc 2's lone "d" duplicates doc 1's tail
    assert(out(1L) == ((Some("a b c d"), 2L, 2L)))
    assert(out(2L) == ((None, 0L, 1L)))
  }

  test("scale contract: text moves only in the doc_id reassembly join, " +
      "never keyed by chunk") {
    val df = ChunkDedup.cleanDocs(
      Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", chunkWords = 3)
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: allNodes(s.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val exs = allNodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(exs.nonEmpty, "expected at least one shuffle in the plan")
    for (ex <- exs if ex.output.exists(_.name == "text")) {
      // the one legal text shuffle is the reassembly co-partitioning —
      // keyed by doc_id alone, NEVER by the chunk hash `h`
      val partExprs = ex.outputPartitioning.toString
      assert(partExprs.contains("doc_id") && !partExprs.contains("h#"),
        s"text shuffled with partitioning $partExprs")
    }
  }
}
