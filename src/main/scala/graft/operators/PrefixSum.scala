package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed prefix sums — cumulative totals in a global sort
  * order WITHOUT a single-task global window (the naive
  * `Window.orderBy(k)` moves every row to one task; Spark itself
  * warns). The primitive under systematic weighted sampling
  * ([[cumulative]] + threshold crossings), CDF/rank computation, and
  * interval-concurrency sweeps.
  *
  * Shape: range-repartition on the order key (contiguous key ranges
  * per partition), per-partition cumsum via a window PARTITIONED by
  * `spark_partition_id()` (parallel, bounded by partition size), then
  * add each partition's prefix offset — computed by a window over the
  * per-partition totals, a ≤`shards`-row relation, and broadcast back.
  * No driver-side data, no global sort task. The range boundaries
  * Spark samples are NOT deterministic, but the output is: cum(key)
  * depends only on the global order, and offsets are computed from
  * actual partition contents — boundary placement cancels out.
  *
  * The (orderCols) tuple must be a NON-NULL total order (unique per
  * row) — equal keys would make "the prefix" ill-defined, and ASC
  * NULL placement differs across engines (Spark sorts NULLS FIRST,
  * others LAST), so a NULL key would silently reorder a replay. The
  * constraint is the caller's tiebreaker discipline (same as every
  * LIMIT in the query surface).
  */
object PrefixSum {

  /** Input plus `cum` = exact running BIGINT total of `valueCol` in
    * ascending `orderCols` order (inclusive of the current row).
    */
  def cumulative(df: DataFrame, orderCols: Seq[String], valueCol: String,
                 shards: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(shards >= 1 && shards <= 4096, s"shards out of range: $shards")
    val oc: Seq[Column] = orderCols.map(col)
    // the lineage cut is CORRECTNESS here, not an optimization: the
    // ranged relation feeds two subtrees (per-row cumsum + per-shard
    // offsets), whose column pruning makes the two range exchanges
    // canonically different — so ReuseExchange does NOT deduplicate
    // them, and each would re-SAMPLE its own range boundaries.
    // Offsets computed under one partitioning joined against shard
    // ids from another silently corrupt every cum. One materialized
    // partitioning, shared by both consumers.
    val ranged = df
      .repartitionByRange(shards, oc: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint(eager = false)
    val inShard = ranged.withColumn("__cum_in",
      sum(col(valueCol)).over(Window.partitionBy(col("__shard"))
        .orderBy(oc: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-shard totals: a <= `shards`-row relation; its own prefix sum
    // runs as one tiny task and broadcasts back — never the data.
    // This is the only single-partition window in the operator and its
    // input cardinality is ≤ shards BY CONSTRUCTION (one aggregated
    // row per shard; pinned in BoundedWindowSpec), so the WindowExec
    // no-partition warning is benign — the data itself flows through
    // the PARTITIONED per-shard window above.
    val offsets = ranged.groupBy("__shard")
      .agg(sum(col(valueCol)).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__shard", "__offset")
    inShard.join(broadcast(offsets), "__shard")
      .withColumn("cum", col("__cum_in") + col("__offset"))
      .drop("__shard", "__cum_in", "__offset")
  }

  /** Systematic probability-proportional-to-size sampling (the
    * classical survey-sampling design, deterministic form): walk the
    * population in `orderCols` order accumulating `weightCol`, and
    * keep every row whose cumulative total crosses a multiple of
    * `step` — a row with weight w is selected with probability
    * min(1, w/step), and exactly floor(total/step)±1 rows come back,
    * evenly spread over the weight mass. All integer arithmetic
    * (`div` crossings over exact BIGINT cums): reproducible on any
    * engine and any partitioning, unlike rand()-keyed designs.
    */
  def systematicPps(df: DataFrame, orderCols: Seq[String],
                    weightCol: String, step: Long,
                    shards: Int = 32): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    // negative weights refuse in-plan: the div-crossing test needs
    // non-negative cums (integer division direction differs across
    // engines below zero), and a negative "size" has no PPS meaning
    val guarded = df.withColumn("__w",
      when(col(weightCol).cast("long") < 0,
        raise_error(concat(lit(s"systematicPps: negative $weightCol: "),
          col(weightCol).cast("string"))))
        .otherwise(col(weightCol).cast("long")))
    cumulative(guarded, orderCols, "__w", shards)
      .where(expr(s"cum div ${step}L") =!= expr(s"(cum - __w) div ${step}L"))
      .drop("__w")
  }
}
