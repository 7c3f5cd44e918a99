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
