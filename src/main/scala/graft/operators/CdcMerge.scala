package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE: apply a changelog of row-level upserts and deletes to a
  * persisted base table — the row-level analog of
  * [[IncrementalAgg]]'s partial/merge/save lifecycle, and the third
  * member of the CDC family (snapshot-diff → changelog →
  * [[CdcMerge.merge]]). Equivalent to SQL
  * `MERGE INTO base USING changes ... WHEN MATCHED [AND op='D'] THEN
  * DELETE / UPDATE ... WHEN NOT MATCHED THEN INSERT`, expressed as the
  * same latest-wins compaction rule as `q_latest_by_key`.
  *
  * Contract: base and changes share one schema — `keyCols` ++ payload
  * ++ `versionCol` (monotone per key: a later change carries a larger
  * version) ++ `opCol` ('U' upsert, 'D' delete). Per key, the row with
  * the highest version across base ∪ changes wins; a winning 'D'
  * removes the key (tombstones do not survive into the output, so the
  * output is a clean compacted table with the same schema — CLOSED
  * under merge, which is what makes daily chaining
  * `merge(merge(base, day1), day2)` work).
  *
  * Scale shape (the reason this isn't just a window over the union):
  * only keys TOUCHED by the changelog are re-resolved. The touched key
  * set (distinct changelog keys — broadcast-sized for any sane daily
  * delta) splits the base with a semi/anti join, so the UNTOUCHED base
  * — overwhelmingly everything at 100 TB — streams through with NO
  * exchange, and the latest-wins window runs over (touched base rows ∪
  * changes), a relation bounded by the changelog size. Re-applying the
  * same changelog is idempotent: the replayed rows tie with the
  * already-merged winners on (version, op) with identical content.
  *
  * Determinism: version ties are broken by op ascending ('D' < 'U'),
  * so an upsert and delete sharing a version resolve to the DELETE —
  * the conservative reading, pinned in CdcMergeSpec; remaining ties
  * are content-identical replays by contract.
  */
object CdcMerge {

  def merge(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
            versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "CDC merge needs at least one key column")
    val cols = base.columns.toSeq
    require(changes.columns.toSeq == cols,
      s"base/changes schema mismatch: $cols vs ${changes.columns.toSeq}")
    require((keyCols :+ versionCol :+ opCol).forall(cols.contains),
      s"schema must contain keys $keyCols + $versionCol + $opCol, got $cols")

    val touched = changes.select(keyCols.map(col): _*).distinct()
    val untouched = base.join(touched, keyCols, "left_anti")
    val affected = base.join(touched, keyCols, "left_semi")
    // op ASC under version DESC: 'D' < 'U' lexicographically, so a
    // same-version upsert/delete pair resolves to the DELETE
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).asc)
    val resolved = affected.unionByName(changes)
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1 && col(opCol) =!= lit("D"))
      .drop("__graft_rn")
    untouched.unionByName(resolved)
  }

  /** Persist a compacted table (plain parquet — the
    * [[IncrementalAgg.save]] convention; bit-exact round trip).
    */
  def save(table: DataFrame, path: String): Unit =
    table.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
