package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing: given two versions of a keyed table, emit
  * exactly the keys whose state changed — `added`, `removed`, or
  * `changed` — and nothing for unchanged rows. The
  * change-data-capture primitive when the source system publishes
  * full snapshots instead of a changelog (the common case for daily
  * warehouse drops); the output feeds the same downstream consumers
  * as a real CDC stream (see `streamingLatestByKey` /
  * q_scd2_intervals for the changelog-side operators).
  *
  * Rows are compared by a 64-bit fingerprint over all NON-KEY columns
  * in deterministic (sorted) column order, so the full-outer join
  * carries (key, 8-byte hash) per side — never the row payload. At
  * 100 TB the shuffle is key+hash wide regardless of row width; the
  * usual xxhash64 collision note applies (two different rows
  * colliding at 2^-64 per pair would report `unchanged` — use the
  * per-column comparison form if that risk matters more than the
  * payload shuffle).
  */
object SnapshotDiff {

  /** (keyCols..., change) for every key whose row differs between
    * `oldDf` and `newDf` (same schema). Unchanged keys are absent.
    *
    * PRECONDITION: `keyCols` uniquely identify a row within each
    * snapshot — duplicate keys would fan out the full-outer join and
    * emit multiple (possibly conflicting) change rows per key. Pass
    * `requireUniqueKeys = true` to enforce this inside the plan: each
    * side is key-aggregated and any duplicate raises a task error
    * (one extra map-side-partial aggregate per side, no driver
    * action).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           requireUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // names AND types: the fingerprint is type-sensitive (xxhash64 of
    // INT 1 != BIGINT 1), so a type-drifted snapshot must refuse
    // loudly here rather than report every row as 'changed'
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    require(shape(oldDf) == shape(newDf),
      s"snapshot schemas differ: ${shape(oldDf)} vs ${shape(newDf)}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).sorted
    require(valCols.nonEmpty, "need at least one non-key column to compare")
    // xxhash64 SKIPS null fields (the running seed passes through), so
    // hashing bare values would fingerprint (x, NULL) and (NULL, x)
    // identically in same-typed columns — systematically reporting
    // value-shifted rows as unchanged. Pairing each value with its
    // null flag makes NULL placement participate in the hash.
    def fp(df: DataFrame, alias: String) = {
      val hashed = df.select(keyCols.map(col) :+
        xxhash64(struct(valCols.toSeq.flatMap(c =>
          Seq(col(c).isNull, col(c))): _*)).as(alias): _*)
      if (!requireUniqueKeys) hashed
      else hashed.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n"), max(col(alias)).as(alias))
        .select(keyCols.map(col) :+
          when(col("__n") > 1, raise_error(concat(
            lit("SnapshotDiff: duplicate snapshot key ("),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
            lit(")")))).otherwise(col(alias)).as(alias): _*)
    }
    fp(oldDf, "__oh").join(fp(newDf, "__nh"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .as("change"): _*)
      .where(col("change").isNotNull)
  }
}

