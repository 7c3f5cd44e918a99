package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact spatial radius join on integer-coordinate points: all
  * (left, right) pairs within Euclidean distance r, found by grid
  * bucketing — the "what's near this point" primitive behind
  * store-coverage, sensor-correlation and geo-dedup queries, and the
  * 2-D companion of [[ZOrder]]'s layout locality.
  *
  * Cells are r×r squares (integer floor division of non-negative
  * coordinates). Any pair within distance r differs by < r in each
  * coordinate, so the pair's cells are identical or edge/corner
  * adjacent — probing the right side into its 3×3 cell neighborhood
  * and equi-joining on the cell key finds EVERY qualifying pair, by
  * construction (no recall parameter to tune, unlike LSH). Each left
  * point lives in exactly ONE cell while the right side replicates
  * 9×, so each candidate pair meets exactly once — no distinct pass.
  * The verify is pure integer arithmetic (dx² + dy² ≤ r²): exact on
  * any engine, no floating-point boundary cases.
  *
  * Scale shape: one shuffle of each side on the cell key (the right
  * side 9×-replicated — bounded, data-independent fan-out, the same
  * explode-vs-product trade as LSH banding); candidate volume is
  * neighborhood-local (~9 · points-per-cell per probe), never the
  * |left|×|right| product. Dense hot cells parallelize across the
  * cell hash; for pathological single-cell pileups the cap pattern
  * from [[HammingBands.pairs64]] applies.
  */
object SpatialJoin {

  /** Pairs (idL, idR, dist2) with dist² ≤ r²; coordinates must be
    * non-negative integers (floor-division cell math).
    */
  def radiusJoin(left: DataFrame, leftId: String,
                 right: DataFrame, rightId: String,
                 xCol: String, yCol: String, r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    val l = left.select(col(leftId).as("__lid"),
      col(xCol).as("lx"), col(yCol).as("ly"),
      expr(s"$xCol div ${r}L").as("cx"),
      expr(s"$yCol div ${r}L").as("cy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val rp = right.select(col(rightId).as("__rid"),
        col(xCol).as("rx"), col(yCol).as("ry"),
        expr(s"$xCol div ${r}L").as("rcx"),
        expr(s"$yCol div ${r}L").as("rcy"))
      .select(col("__rid"), col("rx"), col("ry"),
        explode(array(offsets.map { case (dx, dy) =>
          struct((col("rcx") + dx).as("cx"), (col("rcy") + dy).as("cy"))
        }: _*)).as("c"))
      .select(col("__rid"), col("rx"), col("ry"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val d2 = (col("lx") - col("rx")) * (col("lx") - col("rx")) +
      (col("ly") - col("ry")) * (col("ly") - col("ry"))
    l.join(rp, Seq("cx", "cy"))
      .where(d2 <= r * r)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        d2.cast("long").as("dist2"))
  }
}
