package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic multiplicative-hash row gates shared by every
  * operator that needs a stable sample (k-means training in [[IvfAnn]]
  * and [[PqAnn]], the sample_train_split / sample_stratified queries).
  *
  * The gate depends only on the id VALUE — not on partitioning, task
  * retries, or row order — so a "sample" is a reproducible subset: the
  * property that lets trained-on-a-sample codebooks be inlined into
  * generated oracles, and that makes retried stages at cluster scale
  * re-select identical rows.
  */
object Sampling {

  /** True for ~`fraction` of ids (Knuth multiplicative hash,
    * A = 2654435761). The id is reduced mod 1e6+3 BEFORE the multiply
    * so the product stays well inside LONG for any BIGINT id.
    */
  def hashGate(id: Column, fraction: Double): Column = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    pmod(pmod(id, lit(1000003L)) * 2654435761L, lit(1000000L)) <
      math.max(1L, (fraction * 1000000L).toLong)
  }
}
