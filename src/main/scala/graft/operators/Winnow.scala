package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS technique): over the document's n-token shingle
  * hash sequence, keep only the MINIMUM of each window of w
  * consecutive hashes. Two properties make this the right
  * fingerprint SELECTION (vs hashing all windows, dedup_substring_
  * spans' shape):
  *
  *  - GUARANTEE: any shared token run of length >= n + w - 1 spans a
  *    full window on both sides, and both sides keep that window's
  *    minimum — a shared print is certain, never probabilistic;
  *  - DENSITY: expected kept fraction is 2/(w+1) of all shingles, so
  *    the shuffled/joined print table shrinks ~(w+1)/2 x while
  *    detection granularity stays n + w - 1 tokens.
  *
  * Scale shape: selection is a pure codegen projection over the
  * existing shingle-hash kernel (elementwise `least`, no slicing
  * semantics to diverge across engines); only the winnowed prints
  * are exploded, shuffled, and joined.
  */
object Winnow {

  /** Per-document distinct winnowed prints: (idCol, p BIGINT), one
    * row per selected fingerprint. Documents with fewer than
    * n + w - 1 tokens emit nothing (no full window exists).
    */
  def prints(df: DataFrame, idCol: String, textCol: String,
             n: Int = 5, w: Int = 4): DataFrame = {
    require(n >= 1, s"shingle size n must be >= 1, got $n")
    require(w >= 1, s"winnow window w must be >= 1, got $w")
    val mins = (1 to w).map(t => s"element_at(sh, i + $t)")
      .mkString("least(", ", ", ")")
    df.select(col(idCol),
        graft.expressions.WordShingleHashes(col(textCol), n).as("sh"))
      .where(size(col("sh")) >= w)
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(0, size(sh) - $w), i -> $mins)"))).as("p"))
  }

  /** Per-document fingerprint-overlap statistics against the whole
    * corpus: (idCol, n_prints, n_shared) where n_shared counts this
    * document's prints that some OTHER document (or a repeat in the
    * same document position set) also selected.
    */
  def sharedStats(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 5, w: Int = 4): DataFrame = {
    val ps = prints(df, idCol, textCol, n, w)
    val rep = ps.groupBy("p").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).select("p")
    val shared = ps.join(rep, "p")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    ps.groupBy(idCol).agg(count(lit(1)).as("n_prints"))
      .join(shared, Seq(idCol), "left")
      .select(col(idCol), col("n_prints"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }
}
