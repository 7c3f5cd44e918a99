package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step after [[TextChunk]] in an LLM training
  * pipeline: assign token chunks to fixed-capacity bins (training
  * sequences of ~`binTokens` tokens) so short pieces share a sequence
  * instead of wasting pad tokens.
  *
  * Packing is contiguous-fill WITHIN a shard: chunks are laid out in
  * deterministic `orderCols` order, each chunk goes to the bin its
  * starting token offset falls in (`floor(cum_before / binTokens)`).
  * A chunk therefore never splits across bins, and a bin's total can
  * overshoot `binTokens` by at most one chunk's tokens — the standard
  * greedy trade-off.
  *
  * Scale shape: ONE window partition per shard (the same argument as
  * [[Sampling.shardShuffle]] — a single global running sum would
  * funnel the corpus through one sort task, per-shard sums are
  * embarrassingly parallel), and the result depends only on column
  * VALUES, so task retries and input repartitioning reproduce it.
  */
object TextPack {

  /** Pack `chunks` into bins of `binTokens` per shard. Output: the
    * input columns plus `bin` (0-based per shard) and `bin_offset`
    * (token offset of this chunk within its bin).
    */
  def pack(chunks: DataFrame, shardCol: String, orderCols: Seq[String],
           tokenCol: String, binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive, got $binTokens")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(c => col(c).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before: Column = sum(col(tokenCol)).over(w) - col(tokenCol)
    // `div`/`pmod` keep the arithmetic in exact LONGs: a per-shard
    // cumulative token count can pass 2^53 where double floor() rounds
    chunks
      .withColumn("__before", before.cast("long"))
      .withColumn("bin", expr(s"__before div $binTokens"))
      .withColumn("bin_offset", pmod(col("__before"), lit(binTokens)))
      .drop("__before")
  }
}
