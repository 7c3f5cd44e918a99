package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped Top-N: the N rows with the largest values of a numeric
  * field *per group key* — the generalization of the reference's
  * global top-N (whose constant group key `true`, `TopN.java:92-95`,
  * is the degenerate no-key case).
  *
  * Physical shape: `row_number().over(Window.partitionBy(keys)
  * .orderBy(desc_nulls_last)) <= n`, which Spark >= 3.5 optimizes via
  * the `InferWindowGroupLimit` rule into `WindowGroupLimitExec`: each
  * task keeps only N rows per group *before* the shuffle, so the
  * exchange moves O(groups * N * partitions) rows, not the full input.
  * The helper rank column is dropped so the output schema is identical
  * to the input — the reference's row-preserving contract
  * (`TopN.java:71`).
  *
  * With no keys this delegates to [[TopN]] (sort+limit →
  * `TakeOrderedAndProjectExec`), which is strictly cheaper than a
  * single-partition window — the same rewrite the reference's
  * degenerate constant-key path would want.
  */
object GroupedTopN {

  /** Aggregate-based physical alternative: `topn_agg` (a
    * `TypedImperativeAggregate` keeping an O(n) heap per group) with
    * map-side PARTIAL aggregation — each task pre-reduces to n rows
    * per group before the shuffle. For high group cardinality with
    * small n this beats the window form (which must co-locate and sort
    * every row of a group); it is also exactly the combiner the
    * reference's single-reducer design lacked (TopN.java:92-95).
    * Ties are arbitrary (reference contract); output schema = input.
    */
  def transformViaAggregate(cfg: TopNConfig, keys: Seq[String])(df: DataFrame): DataFrame = {
    TopNValidator.validateOrThrow(cfg, Some(df.schema))
    if (keys.isEmpty) return TopN.transform(cfg)(df)
    val base = if (cfg.ignoreNull) df.where(col(cfg.field).isNotNull) else df
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    base.groupBy(keys.map(col): _*)
      .agg(graft.expressions.TopNAggregate
        .topNAgg(col(cfg.field), payload, cfg.size).as("__graft_top"))
      .select(explode(col("__graft_top")).as("__graft_row"))
      .select(col("__graft_row.*"))
  }

  def transform(cfg: TopNConfig, keys: Seq[String],
                tiebreakers: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    TopNValidator.validateOrThrow(cfg, Some(df.schema))
    if (keys.isEmpty) {
      if (tiebreakers.isEmpty) TopN.transform(cfg)(df)
      else TopN.transformDeterministic(cfg, tiebreakers)(df)
    } else {
      val ordering = col(cfg.field).desc_nulls_last +: tiebreakers.map(col(_).asc)
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      val base = if (cfg.ignoreNull) df.where(col(cfg.field).isNotNull) else df
      val rankCol = "__graft_topn_rn"
      base
        .withColumn(rankCol, row_number().over(w))
        .where(col(rankCol) <= cfg.size)
        .drop(rankCol)
    }
  }
}
