package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep): keep
  * a per-group ALGEBRAIC state — (count, sum, min, max) — that new
  * batches MERGE into, so the running aggregate over an append-only
  * 100 TB fact table is maintained by scanning only each day's
  * increment, never the history. This is the same partial/final
  * decomposition Spark's own hash aggregate uses inside one query,
  * lifted across job boundaries: `partial` is the map-side combine,
  * `merge` is the final reduce, and the state parquet is the shuffle
  * file that persists between days.
  *
  * All components are mergeable (sum of sums, min of mins, …); derived
  * measures (avg = sum/count) are computed at READ time from the
  * state, never stored — storing them would break mergeability.
  * Counts and integer-cents sums stay exact BIGINT end to end.
  *
  * The state is one row per group — for a grouping column of bounded
  * cardinality it is broadcast-sized regardless of fact-table scale,
  * and `merge` shuffles only state rows (group cardinality × batches),
  * never facts.
  */
object IncrementalAgg {

  val stateCols: Seq[String] = Seq("agg_cnt", "agg_sum", "agg_min", "agg_max")

  /** Per-batch partial state: one row per group with the mergeable
    * components over BIGINT `valueCol` (cast exact upstream — cents
    * discipline, see QueryDef conventions). `agg_cnt` counts NON-NULL
    * values, so all four components cover the same row set (sum, min
    * and max skip NULLs too) and `finish`'s avg stays the mean of the
    * values actually summed; count rows instead upstream if NULL rows
    * must be visible.
    */
  def partial(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("agg_cnt"),
        sum(col(valueCol)).as("agg_sum"),
        min(col(valueCol)).as("agg_min"),
        max(col(valueCol)).as("agg_max"))
  }

  /** Merge any number of partial states (associative + commutative —
    * batch order cannot change the result). Input frames must all
    * carry `groupCols` + [[stateCols]].
    */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.foreach { st =>
      val missing = (groupCols ++ stateCols).filterNot(st.columns.contains)
      require(missing.isEmpty, s"state frame missing columns: $missing")
    }
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("agg_cnt")).as("agg_cnt"),
        sum(col("agg_sum")).as("agg_sum"),
        min(col("agg_min")).as("agg_min"),
        max(col("agg_max")).as("agg_max"))
  }

  /** Read-time view over a state: the derived avg joins the exact
    * components; one IEEE division of exact BIGINTs (the PMI
    * convention — bit-identical across engines).
    */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("agg_avg",
      col("agg_sum").cast("double") / col("agg_cnt").cast("double"))

  def save(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
