package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    hashValue(id) < math.max(1L, (fraction * 1000000L).toLong)
  }

  /** The underlying hash value in [0, 1e6) — exposed for operators
    * that need an ORDER (not just a gate) over the same deterministic
    * randomness, e.g. [[shardShuffle]].
    */
  def hashValue(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * 2654435761L, lit(1000000L))

  /** Deterministic training-data shuffle, sharded: rows are assigned
    * to `nShards` shards by id hash and ordered WITHIN each shard by
    * (hash, id). This is the scalable form of "shuffle the corpus
    * before training": a single global random order would funnel the
    * whole dataset through one sorting task, while per-shard order is
    * embarrassingly parallel (one window partition per shard — at
    * cluster scale, one output file per shard) and epoch-reproducible:
    * the order depends only on id VALUES, never on partitioning or
    * task retries.
    *
    * Output: the id column, `shard`, `pos` (1-based position within
    * the shard). Hash collisions are broken by id, so the total order
    * is unique.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), hashValue(col(idCol)).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .select(col(idCol), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  /** Exactly-k deterministic "uniform" sample: the k rows whose id
    * hashes smallest (ties by id). Complements [[hashGate]]'s
    * Bernoulli gate when the pipeline needs an exact count (eval
    * sets, human-review batches). Two properties make it the
    * 100 TB-safe form of `ORDER BY rand() LIMIT k`:
    *
    *  - MERGEABLE: bottom-k of a union is the bottom-k of the
    *    per-shard bottom-ks, so the plan is `TakeOrderedAndProject` —
    *    each task forwards at most k rows and there is no full sort
    *    or shuffle of the corpus;
    *  - NESTED: the bottom-k' for k' < k is a prefix, so growing an
    *    eval set keeps every previously selected row (monotone
    *    experiments), and the selection is identical across retries,
    *    partitionings, and engines (hash of the id VALUE only).
    *
    * Output: (idCol, h) in hash order — h kept so downstream can
    * extend or merge samples without recomputing it.
    */
  def bottomK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(col(idCol), hashValue(col(idCol)).as("h"))
      .orderBy(col("h").asc, col(idCol).asc)
      .limit(k)
  }

  /** [[bottomK]] within each group: exactly min(k, |group|) rows per
    * `groupCol` value — the exact-count form of stratified sampling
    * (per-language eval sets, per-domain review batches). The
    * rank<=k filter plans as `WindowGroupLimit`, so each map task
    * forwards at most k rows per group before the exchange; the same
    * mergeable/nested/deterministic properties as [[bottomK]] hold
    * per group.
    *
    * Output: (groupCol, idCol, h).
    */
  def groupBottomK(df: DataFrame, groupCol: String, idCol: String,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("h").asc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), hashValue(col(idCol)).as("h"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
