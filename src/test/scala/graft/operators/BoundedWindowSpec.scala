package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** NUMERIC bounds for the four library-operator SINGLE-PARTITION
  * windows (`Window.orderBy` with no partitionBy — the shape that is
  * an anti-pattern over raw data because one task sorts everything).
  * Each is safe only because its INPUT cardinality is bounded by
  * construction — by k, by a value range, or by the shard count,
  * never by data volume. This spec pins those bounds structurally
  * (the plan below the window contains the bounding operator) and
  * numerically (the window input row count is within the bound), so
  * a refactor that accidentally feeds raw data into one of them fails
  * here instead of becoming a 100 TB single-task sort.
  *
  * Library sites pinned here: Bm25.topK (≤ k), HybridRetrieval.rrf2
  * (≤ topK), Skyline.frontier (≤ |distinct x| ≤ value range),
  * PrefixSum.cumulative offsets (≤ shards). These four are NOT the
  * only global windows in the repo — query-level sites (e.g. the
  * histogram/quantile queries' windows over ~100-bucket relations)
  * exist too; [[graft.GlobalWindowSweepSpec]] sweeps ALL of them,
  * registry-wide, for structural boundedness, so new sites cannot
  * appear unpinned.
  */
class BoundedWindowSpec extends SparkSuite {

  /** Full node list, descending through AQE wrappers and query stages
    * (a plain collect stops at AdaptiveSparkPlanExec / stage leaves).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      s +: allNodes(s.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  /** All single-partition WindowExec nodes in the executed plan. */
  private def globalWindows(df: DataFrame): Seq[WindowExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  /** Rows that actually flowed into the window in the LAST execution:
    * the numOutputRows metric of the topmost node under it that
    * reports one (the bounding aggregate in the Skyline/PrefixSum
    * shapes; projections in between preserve cardinality). Call after
    * materializing the DataFrame. Not usable when the bounding node is
    * TakeOrderedAndProject (it reports no numOutputRows) — those sites
    * assert on the final count instead.
    */
  private def inputRows(w: WindowExec): Long = {
    // prefer the bounding AGGREGATE's own metric (the node the bound
    // argument is actually about); fall back to the first
    // metric-bearing descendant. headOption + an explicit failure
    // message, so a Spark upgrade that renames the metric or reshapes
    // the subtree fails with the bound diagnostic instead of an
    // opaque NoSuchElementException.
    val nodes = allNodes(w.child)
    val metric = nodes.filter(isAggregate).iterator
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .nextOption()
      .orElse(nodes.iterator
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .nextOption())
    assert(metric.isDefined,
      s"no numOutputRows metric found under the global window — " +
        s"cannot verify the input-cardinality bound; subtree:\n${w.child}")
    metric.get
  }

  private def isAggregate(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
    case _ => false
  }

  private lazy val docs = graft.Tables(spark, sf("sf0.001"), "documents")

  test("Bm25.topK: the only global window reads ≤ k rows (fed by GlobalLimit)") {
    val terms = Seq("the", "and")
    val stats = Bm25.fitStats(docs, "text", terms)
    val k = 25
    val out = Bm25.topK(docs, "doc_id", "text", terms, stats, k)
    out.collect() // materialize so the final AQE plan + metrics exist
    val gw = globalWindows(out)
    assert(gw.size == 1, s"expected exactly one global window, got ${gw.size}")
    // structural: a limit-k operator sits below the window
    val hasLimit = allNodes(gw.head.child).exists {
      case l: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        l.limit == k
      case g: org.apache.spark.sql.execution.GlobalLimitExec => g.limit == k
      case _ => false
    }
    assert(hasLimit, s"no limit($k) below the window:\n${gw.head.child}")
    // numeric: the rank window is the final operator and preserves
    // cardinality, so its input row count IS the result count
    assert(out.count() <= k)
  }

  test("HybridRetrieval.rrf2: the only global window reads ≤ topK rows") {
    val a = docs.limit(100).select(col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("doc_id")).as("rank"))
    val b = docs.limit(100).select(col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy(col("doc_id").desc)).as("rank"))
    val topK = 10
    val out = HybridRetrieval.rrf2(a, b, "doc_id", "rank", topK)
    out.collect()
    val gw = globalWindows(out)
    assert(gw.nonEmpty, "expected the final-rank global window")
    val fin = gw.head // outermost = the rrf2 rank window
    val hasLimit = allNodes(fin.child).exists {
      case l: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        l.limit == topK
      case g: org.apache.spark.sql.execution.GlobalLimitExec => g.limit == topK
      case _ => false
    }
    assert(hasLimit, s"no limit($topK) below the window:\n${fin.child}")
    // the rank window is final and cardinality-preserving: result
    // count == window input count
    assert(out.count() <= topK)
  }

  test("Skyline.frontier: global window reads one row per distinct x, never the table") {
    val n = 5000
    val xRange = 40L
    val df = spark.range(n.toLong).select(
      pmod(col("id"), lit(xRange)).as("x"),
      pmod(col("id") * 31L, lit(997L)).as("y"))
    val out = Skyline.frontier(df, "x", "y")
    out.collect()
    val gw = globalWindows(out)
    assert(gw.size == 1, s"expected exactly one global window, got ${gw.size}")
    // structural: an aggregate (one row per x group) sits below the window
    val hasAgg = allNodes(gw.head.child).exists(isAggregate)
    assert(hasAgg, s"no per-x aggregate below the window:\n${gw.head.child}")
    val in = inputRows(gw.head)
    assert(in <= xRange, s"window reads $in rows > x-range bound $xRange")
    assert(in < n, "window must never read the raw table")
  }

  test("PrefixSum.cumulative: global window reads ≤ shards rows (per-shard offsets only)") {
    val n = 20000L
    val shards = 16
    val df = spark.range(n).select(col("id"), lit(1L).as("w"))
    val out = PrefixSum.cumulative(df, Seq("id"), "w", shards = shards)
    out.collect()
    // exactly one single-partition window (the offsets); the data
    // flows through the PARTITIONED per-shard window
    val gw = globalWindows(out)
    assert(gw.size == 1, s"expected exactly one global window, got ${gw.size}")
    val hasAgg = allNodes(gw.head.child).exists(isAggregate)
    assert(hasAgg, s"no per-shard aggregate below the window:\n${gw.head.child}")
    val in = inputRows(gw.head)
    assert(in <= shards, s"offsets window reads $in rows > $shards shards")
    // and the result is still the exact global prefix sum
    val mx = out.agg(max("cum")).head().getLong(0)
    assert(mx == n, s"prefix sum corrupted: max cum $mx != $n")
  }
}
