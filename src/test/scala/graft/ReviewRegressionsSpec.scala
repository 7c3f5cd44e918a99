package graft

import graft.expressions.TopNAggregate
import graft.functions.VectorFunctions
import graft.operators._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regressions for the round-1 code-review findings: each test pins
  * the fixed behavior.
  */
class ReviewRegressionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine of a zero-norm vector is NULL and never outranks real neighbors") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(rows.where($"vec_id" === 1), rows, k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("nid"))
    // zero vector (id 3) ranks LAST, not first
    assert(top.head == 2L)
    assert(top.last == 3L)
    val z = rows.where($"vec_id" === 3)
      .select(VectorFunctions.cosine($"embedding", $"embedding")).head()
    assert(z.isNullAt(0))
  }

  test("topn_agg over a window frame evaluates repeatedly without draining") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("b", 4L, 5.0))
      .toDF("g", "id", "v")
    val w = Window.partitionBy($"g")
    val out = df.withColumn("top2",
        TopNAggregate.topNAgg($"v", $"id", 2).over(w))
      .select($"id", $"top2").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // every row of group a sees the same non-empty top-2 [2, 3]
    assert(out(1L) == Seq(2L, 3L))
    assert(out(2L) == Seq(2L, 3L))
    assert(out(3L) == Seq(2L, 3L))
    assert(out(4L) == Seq(4L))
  }

  test("vector_dot on mismatched lengths fails loudly, not by truncation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dot($"v", array(lit(1.0), lit(2.0)))).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: rootMessages(x.getCause))
    assert(rootMessages(e).exists(m => m != null && m.contains("mismatched vector lengths")))
  }

  test("SimHash.pairs refuses maxHamming beyond the band guarantee") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SimHash.pairs(df, "doc_id", "text", maxHamming = 4)
    }
    assert(e.getMessage.contains("maxHamming <= 3"))
  }

  test("saltedJoin refuses join types that preserve the replicated side") {
    val a = Seq((1L, 1.0)).toDF("k", "x")
    val b = Seq((1L, 2.0)).toDF("k", "y")
    val e = intercept[IllegalArgumentException] {
      SkewTools.saltedJoin(a, b, "k", 4, "right_outer")
    }
    assert(e.getMessage.contains("replicated"))
  }

  test("as-of join carries a NULL value from the latest prior right row") {
    val left = Seq((1L, 7L, 9L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(10L), 7L, 5L),  // older, non-null value
      (Option.empty[Long], 7L, 8L)) // latest prior, NULL value
      .toDF("val", "user_id", "ts")
    val out = AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts", "ts",
      "val", "prior").collect().head
    // the t=8 row wins even though its value is NULL
    assert(out.isNullAt(out.fieldIndex("prior")))
  }

  test("non-convergent label propagation raises instead of silently mislabeling") {
    val n = 40L
    val nodes = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      NearDupClusters.representatives(nodes, pairs, "doc_id", maxIterations = 2)
    }
  }

  test("query-side floor division FLOORS on negatives (DuckDB // parity)") {
    // q_gap_fill / q_histogram use (a - pmod(a, b)) div b; Spark's bare
    // `div` truncates toward zero and would disagree with DuckDB's `//`
    // for pre-1970 timestamps and negative prices
    val vals = Seq(-7L, -5L, -3L, -1L, 0L, 1L, 3L, 5L, 7L)
    val got = vals.toDF("a")
      .select(expr("(a - pmod(a, 3L)) div 3L").as("fd"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map(v => Math.floorDiv(v, 3L)), got)
    // and the truncating form genuinely differs on this domain —
    // the regression is observable, not vacuous
    val trunc = vals.toDF("a").select(expr("a div 3L")).collect()
      .map(_.getLong(0)).toSeq
    assert(trunc != got)
  }

  test("CountMin.merge refuses shards built under different Params") {
    val ks = (1L to 100L).toDF("k")
    val a = CountMin.build(ks, "k", CountMin.Params(depth = 4, width = 64))
    val b = CountMin.build(ks, "k", CountMin.Params(depth = 4, width = 128))
    val ex = intercept[IllegalArgumentException] {
      CountMin.merge(Seq(a, b))
    }
    assert(ex.getMessage.contains("identical Params"))
    // a hand-built counter table without build()'s stamp is refused too
    val unstamped = Seq((0, 1L, 5L)).toDF("row", "col", "cnt")
    intercept[IllegalArgumentException] { CountMin.merge(Seq(a, unstamped)) }
    // matching shards still merge, and merged output re-merges (the
    // stamp survives the aggregate)
    val p = CountMin.Params(depth = 4, width = 64)
    val m = CountMin.merge(Seq(a, CountMin.build(ks, "k", p)))
    assert(CountMin.merge(Seq(m, CountMin.build(ks, "k", p))).count() > 0)
  }

  test("Bloom raises loudly on NULL keys instead of silent false negatives") {
    val withNull = Seq((1L, java.lang.Long.valueOf(7L)),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "fp")
    val clean = Seq((1L, 7L)).toDF("id", "fp")
    val bits = Bloom.bitset(clean, "fp")
    // probe side: the NULL-key row must abort the job, not read false
    val ex = intercept[Exception] {
      Bloom.mightContain(withNull, "id", "fp", bits).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("non-null")
      || ex.getCause != null && ex.getCause.getMessage.contains("non-null"))
    // build side: a NULL key inserts nothing — also refused
    intercept[Exception] { Bloom.bitset(withNull, "fp").collect() }
    // and the clean path still answers true for a member
    val hit = Bloom.mightContain(clean, "id", "fp", bits)
      .collect().head.getBoolean(1)
    assert(hit)
  }

  test("ZOrder.layout names NULL coordinates in its per-row guard") {
    val bad = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("x", "y")
    val ex = intercept[Exception] {
      ZOrder.layout(bad, col("x"), col("y"), 2).count()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("non-null"))
  }
}
