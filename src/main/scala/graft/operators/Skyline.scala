package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline: Borzsony/Kossmann/Stocker, ICDE
  * 2001 — re-derived here as a two-level aggregate, not their
  * block-nested-loops): the rows not dominated by any other row,
  * where a row dominates another if it is <= on the minimized
  * dimension and >= on the maximized one, strict on at least one.
  * The "best tradeoffs" primitive: cheapest-per-deadline offers,
  * best-quality-per-length documents, newest-per-score checkpoints.
  *
  * Scale shape — the naive formulations both fail at 100 TB: the
  * dominance self-join is O(n^2), and a single running-max window
  * over the whole corpus funnels every row through ONE task. This
  * implementation exploits that a skyline only needs per-x-value
  * maxima:
  *
  *  1. aggregate to one row per distinct x (partial-agg'd shuffle,
  *     output bounded by |distinct x| — the value RANGE, not the
  *     data volume, exactly the q_hist_quantiles argument);
  *  2. one running-max window over that x-level table (tiny);
  *  3. broadcast the surviving (x, y_max) frontier back over the
  *     fact scan to emit the full skyline rows.
  *
  * An x-group contributes iff its max STRICTLY exceeds every earlier
  * group's max; within the group, exactly the rows attaining the max
  * survive (ties all kept — none dominates another: equal on both
  * dimensions is not strict on either).
  *
  * Integer-exact when x and y are integers, so the declared query
  * (q_skyline) hash-matches its DuckDB replay.
  */
object Skyline {

  /** Skyline rows of `df`, minimizing `xCol` and maximizing `yCol`
    * (both must be non-null integer-typed columns). Output: the input
    * columns of every non-dominated row.
    */
  def frontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    // running max over x-level rows: strictly-earlier groups only.
    // Single-partition window, but its input is perX — ONE row per
    // distinct x value (bounded by the x VALUE RANGE, never the table
    // size; pinned in BoundedWindowSpec) — so the no-partition
    // WindowExec warning is benign by construction.
    val w = Window.orderBy(col(xCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the frontier derives from df itself — rename its join keys so
    // the self-join is unambiguous without aliases at the call site
    val frontier = perX
      .withColumn("__prev", max(col("__ymax")).over(w))
      .where(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col(xCol).as("__fx"), col("__ymax"))
    df.join(broadcast(frontier),
        df(xCol) === col("__fx") && df(yCol) === col("__ymax"))
      .select(df.columns.map(df(_)): _*)
  }

  /** DuckDB replay for oracle construction: same three stages over
    * `table`, emitting `cols` of the skyline rows.
    */
  def oracleSql(table: String, xExpr: String, yExpr: String,
                cols: String): String =
    s"""WITH px AS (SELECT $xExpr AS x, max($yExpr) AS ymax
          FROM $table GROUP BY 1),
      fr AS (SELECT x, ymax FROM (
          SELECT x, ymax, max(ymax) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
          FROM px)
        WHERE prev IS NULL OR ymax > prev)
    SELECT $cols FROM $table t
    JOIN fr ON ($xExpr) = fr.x AND ($yExpr) = fr.ymax"""
}
