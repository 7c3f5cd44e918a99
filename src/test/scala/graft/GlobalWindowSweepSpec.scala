package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Registry-wide single-partition-window guardrail.
  *
  * A `Window.orderBy` with no partitionBy plans a WindowExec with an
  * empty partitionSpec: ONE task sorts the window's whole input. Over
  * a bounded relation (a top-k, a bucket histogram, a per-shard
  * offset table) that is the right plan; over raw rows it is the
  * classic 100 TB single-task sort. BoundedWindowSpec pins the NUMERIC
  * bounds of the four library-operator sites; this spec closes the
  * gap it cannot: it sweeps EVERY declared query's physical plan and
  * asserts that every single-partition WindowExec anywhere in the
  * registry is structurally bounded — each input path from the window
  * down to a source passes through a bounding operator (an aggregate,
  * a limit, or a literal local relation) before it reaches data.
  * A refactor that feeds raw rows into any global window — present or
  * future, in any of the declared queries — fails here by name.
  */
class GlobalWindowSweepSpec extends SparkSuite {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      s +: allNodes(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      r +: allNodes(r.child)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def globalWindows(df: DataFrame): Seq[WindowExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  /** A node whose OUTPUT cardinality is bounded by construction, not
    * by data volume: aggregates (one row per group over a bounded key
    * space — every registry global window sits over bucket/k/shard
    * keys), limits, and driver-side literal relations.
    */
  private def isBounding(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case r: org.apache.spark.sql.execution.RangeExec
        if r.range.numElements.isValidLong &&
          r.range.numElements.toLong <= 65536 => true
    case _ => false
  }

  /** Every path from `p` down to a leaf must hit a bounding node
    * before it hits data. `exists` over the subtree would be wrong —
    * a join of a bounded side with a raw scan below the window would
    * pass an exists-check while raw rows still flow in.
    */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _ if isBounding(p) => true
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      bounded(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      bounded(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      bounded(r.child)
    case _ if p.children.isEmpty => false // reached a data source unbounded
    case _ => p.children.forall(bounded)
  }

  test("sweep: every single-partition window in every declared query is bounded") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      globalWindows(df).zipWithIndex.foreach { case (w, i) =>
        if (!bounded(w.child))
          offenders += s"$name (window #$i over ${w.orderSpec.mkString(",")})"
      }
    }
    assert(offenders.isEmpty,
      s"UNBOUNDED single-partition window(s) — one task would sort raw " +
        s"data at scale:\n  ${offenders.mkString("\n  ")}")
  }

  test("the detector flags a raw-rows global window (negative self-check)") {
    val raw = Tables(spark, sf("sf0.001"), "lineitem")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"))))
    val gw = globalWindows(raw)
    assert(gw.nonEmpty, "expected the raw window to plan a global WindowExec")
    assert(gw.forall(w => !bounded(w.child)),
      "detector failed to flag a window fed by a raw parquet scan")
  }

  test("the detector accepts a bounded (aggregate-fed) global window") {
    val ok = Tables(spark, sf("sf0.001"), "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("q"))))
    val gw = globalWindows(ok)
    assert(gw.nonEmpty)
    assert(gw.forall(w => bounded(w.child)),
      "detector wrongly flagged an aggregate-bounded window")
  }
}
