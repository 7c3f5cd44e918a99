package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) of two ranked retrieval lists —
  * Cormack/Clarke/Büttcher, "Reciprocal rank fusion outperforms
  * Condorcet and individual rank learning methods" (SIGIR 2009). The
  * standard way to combine lexical (BM25) and dense (embedding-cosine)
  * retrieval without score calibration: each list contributes
  * `1/(k0 + rank)` for the documents it ranked, and documents missing
  * from a list simply contribute nothing from it.
  *
  * Scale shape: the inputs are already top-k lists — k rows each, no
  * matter the corpus size — so the fusion join is between two
  * k-row relations that AQE broadcasts; the expensive work (corpus
  * scan for BM25, index probe for ANN) happened upstream in the
  * operators that produced the lists. Fusion itself is O(k).
  *
  * Determinism: ranks are exact integers, each RRF term is ONE double
  * division `1.0 / (k0 + rank)` (IEEE-exact, identical in any
  * engine), and the fused score is the two terms added in a fixed
  * order — so even the double scores hash-match against the DuckDB
  * oracle, same discipline as the BM25 scorer.
  */
object HybridRetrieval {

  /** Fuses two (id, rank) lists; returns topK rows of
    * (idCol, rank_a BIGINT?, rank_b BIGINT?, rrf_score DOUBLE,
    * rank BIGINT) ordered by fused score with id tiebreak. Ranks are
    * NULL where a list did not retrieve the document.
    */
  def rrf2(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
           topK: Int, k0: Int = 60): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    val aa = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val bb = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    def term(rank: String) =
      coalesce(lit(1.0) / (lit(k0.toLong) + col(rank)), lit(0.0))
    val fused = aa.join(bb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (term("rank_a") + term("rank_b")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
    // final rank over the topK survivors only — single-partition window
    // fed by the GlobalLimit(topK) above, cost O(topK) regardless of
    // corpus size (bound pinned in BoundedWindowSpec; the WindowExec
    // no-partition warning is benign here)
    fused.withColumn("rank",
      row_number().over(Window.orderBy(col("rrf_score").desc, col(idCol).asc))
        .cast("long"))
  }
}
