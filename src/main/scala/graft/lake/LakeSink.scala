package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once Structured-Streaming sink into a [[LakeTable]] via
  * `foreachBatch`.
  *
  * Spark's foreachBatch contract is AT-LEAST-once: after a failure the
  * restarted query replays the last unacknowledged micro-batch with
  * the SAME `batchId`. The log makes the append idempotent: every
  * streaming commit carries its `(appId, batchId)` token in the commit
  * Meta, the snapshot exposes the highest committed batch per app, and
  * [[addBatch]] skips any batch at or below it. Duplicate delivery
  * therefore becomes a no-op COMMIT-level check — not a row-level
  * dedup — which is the same transactional-sink design public
  * lakehouse formats use for their streaming writers.
  *
  * The skip check runs TWICE: a cheap pre-read here (skips the whole
  * write for an obvious replay) and again INSIDE [[LakeLog.commit]]'s
  * optimistic retry loop (`dedupBatch`): two concurrent deliveries of
  * the same batchId — the zombie-writer scenario — can both pass the
  * pre-read, but whichever loses the commit race re-reads the
  * snapshot on retry, finds the token committed, and aborts with
  * [[LakeLog.DuplicateBatchException]], which is swallowed into the
  * same `false` as the pre-read skip. The rows land exactly once.
  */
object LakeSink {

  /** Append `df` as streaming batch `batchId` of `appId`. Returns
    * true if committed, false if this (or a later) batch was already
    * committed for `appId` (replay after recovery — skipped).
    */
  def addBatch(root: String, appId: String, batchId: Long, df: DataFrame,
               nFiles: Int = 2, mergeSchema: Boolean = false): Boolean = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val fs = LakeLog.fileSystem(rootP, spark.sparkContext.hadoopConfiguration)
    val committed = LakeLog.snapshot(fs, rootP, None)
      .committedBatches.getOrElse(appId, Long.MinValue)
    if (batchId <= committed) return false
    try {
      LakeTable.append(spark, root, df, nFiles = nFiles,
        appId = Some(appId), batchId = Some(batchId),
        mergeSchema = mergeSchema)
      true
    } catch {
      case _: LakeLog.DuplicateBatchException => false // concurrent replay
    }
  }

  /** Ready-made `foreachBatch` function:
    * `stream.writeStream.foreachBatch(LakeSink.writer(root, appId))`.
    * `mergeSchema = true` lets a restarted producer with ADDITIVELY
    * evolved events keep appending (same contract as
    * [[LakeTable.append]]: new columns join as nullable, type changes
    * refuse loudly).
    */
  def writer(root: String, appId: String, nFiles: Int = 2,
             mergeSchema: Boolean = false): (DataFrame, Long) => Unit =
    (df, batchId) =>
      { addBatch(root, appId, batchId, df, nFiles, mergeSchema); () }

  /** MERGE streaming batch `batchId` of `appId` into the table —
    * the CDC-apply sink: each micro-batch of change rows (table
    * columns + version + op) upserts/deletes by `keyCol` under
    * [[LakeTable.merge]]'s latest-wins rule, with the same
    * commit-level (appId, batchId) idempotence as [[addBatch]]: a
    * replayed micro-batch after recovery is skipped whole, so
    * at-least-once delivery becomes an exactly-once table.
    */
  def mergeBatch(root: String, appId: String, batchId: Long,
                 changes: DataFrame, keyCol: String,
                 versionCol: String = "version",
                 opCol: String = "op"): Boolean = {
    val spark = changes.sparkSession
    val rootP = new Path(root)
    val fs = LakeLog.fileSystem(rootP, spark.sparkContext.hadoopConfiguration)
    val committed = LakeLog.snapshot(fs, rootP, None)
      .committedBatches.getOrElse(appId, Long.MinValue)
    if (batchId <= committed) return false
    try {
      LakeTable.merge(spark, root, changes, keyCol, versionCol, opCol,
        appId = Some(appId), batchId = Some(batchId))
      true
    } catch {
      case _: LakeLog.DuplicateBatchException => false // concurrent replay
    }
  }

  /** Ready-made CDC-apply `foreachBatch` function:
    * `cdcStream.writeStream.foreachBatch(LakeSink.mergeWriter(root,
    * appId, "id"))`.
    */
  def mergeWriter(root: String, appId: String, keyCol: String,
                  versionCol: String = "version",
                  opCol: String = "op"): (DataFrame, Long) => Unit =
    (df, batchId) =>
      { mergeBatch(root, appId, batchId, df, keyCol, versionCol, opCol); () }

  /** TABLE REPLICATION: apply a `readChangeFeed` stream of another
    * lake into `root`, keyed on `keyCol` —
    * `src.readStream.format("graft-lake").option("readChangeFeed",
    * true).load(...).writeStream.foreachBatch(LakeSink.replicator(
    * dst, appId, "id"))`. The change feed's tagged rows become a
    * latest-wins changelog: the merge version is
    * `2·_commit_version + (1 if insert)`, so within one source
    * commit an UPDATE's insert row outranks its delete row (the
    * multiset CDC emits updates as same-commit delete+insert pairs;
    * without the tiebreak the merge's ties-favor-D rule would drop
    * every updated key), while a later commit always outranks an
    * earlier one. Combined with the merge sink's (appId, batchId)
    * idempotence and the source's checkpointed offsets, the replica
    * converges to the source's latest keyed state EXACTLY ONCE end
    * to end — restart-safe on both sides, certified under the
    * oracle by `stream_lake_replicate_replay`.
    */
  def replicator(root: String, appId: String,
                 keyCol: String): (DataFrame, Long) => Unit =
    (changes, batchId) => {
      import org.apache.spark.sql.functions._
      val asChangelog = changes
        .withColumn("version",
          col("_commit_version") * 2 +
            when(col("_change_type") === "insert", 1L).otherwise(0L))
        .withColumn("op",
          when(col("_change_type") === "insert", "U").otherwise("D"))
        .drop("_change_type", "_commit_version")
      mergeBatch(root, appId, batchId, asChangelog, keyCol)
      ()
    }
}
