package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recursive sub-bucket refinement shared by the hot-bucket splits
  * ([[MinHashLSH.candidatePairs]], [[SemDedup]]): one level of
  * `pmod(hash, ceil(n/cap))` keeps the EXPECTED sub-bucket at `cap`,
  * but a skewed level-1 draw (or adversarial key collisions) can
  * leave individual sub-buckets far over it — and an over-cap
  * sub-bucket re-creates exactly the quadratic self-join the cap
  * exists to prevent. Refining recursively with a depth-salted hash
  * bounds every sub-bucket, not just the average.
  */
private[operators] object HotSplit {

  /** Appends a string column `__sub` partitioning each `keys` group
    * into sub-groups of at most ~`cap` rows: level d re-hashes the
    * rows of any still-oversized sub-group with a depth-salted
    * `xxhash64(saltCol, d)` into ceil(n/cap) finer cells, recursing
    * until every sub-group fits or `maxDepth` levels are exhausted
    * (then proceeds LOUDLY — correctness is never at stake, only the
    * width of the downstream self-join; rows whose salt values are
    * bitwise identical can never separate, and identical-content rows
    * are the upstream star's job, not this splitter's). Each level is
    * one driver-side count over KB-sized group counts. Deterministic:
    * sub paths are pure functions of (saltCol, group sizes).
    */
  def subSplit(rows: DataFrame, keys: Seq[String], saltCol: Column,
               cap: Long, what: String, maxDepth: Int = 4): DataFrame = {
    var cur = rows.withColumn("__sub", lit(""))
    var depth = 0
    var open = true
    while (open && depth < maxDepth) {
      val gk = keys :+ "__sub"
      val over = cur.groupBy(gk.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > cap)
        .localCheckpoint(eager = false) // read by the count + the join
      if (over.count() == 0) open = false
      else {
        depth += 1
        cur = cur.join(broadcast(over), gk, "left")
          .withColumn("__sub", when(col("__n").isNull, col("__sub"))
            .otherwise(concat(col("__sub"), lit("/"),
              pmod(xxhash64(saltCol, lit(depth)),
                expr(s"greatest(1L, (__n + ${cap - 1}) div $cap)"))
                .cast("string"))))
          .drop("__n")
          .localCheckpoint(eager = false) // next level counts + reads it
      }
    }
    if (open) System.err.println(
      s"[graft] $what: sub-buckets still exceed $cap after $maxDepth " +
        "salted re-splits (identical or adversarially colliding salt " +
        "values) — proceeding with the oversized self-join rather than " +
        "losing pairs")
    cur
  }
}
