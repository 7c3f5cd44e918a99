package graft.operators

import graft.expressions.TokenCount
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword retrieval over a tokenized document corpus —
  * the lexical-search half of a training-data pipeline (quality
  * filtering by query relevance, targeted corpus slicing, retrieval
  * baselines for embedding models). Robertson/Spärck Jones weighting
  * with the non-negative idf variant `ln(1 + (N - df + 0.5)/(df + 0.5))`
  * (the form used by Lucene).
  *
  * Scale shape: scoring a fixed query against the corpus is ONE
  * projection-only scan — per document, term frequencies come from the
  * codegen'd single-pass [[graft.expressions.TokenCount]] kernel (no
  * token-array materialization, no explode, no shuffle), and the
  * top-k collapses to TakeOrderedAndProject. Corpus statistics
  * (N, avgdl, per-term df) are a one-pass aggregate whose driver
  * footprint is `2 + |terms|` numbers — computed once per corpus
  * lifetime and reusable across every query that shares the term
  * vocabulary, exactly like an ANN index's centroids. At 100 TB the
  * alternative inverted-index design (explode + posting join) pays a
  * full-corpus shuffle to build; the scan-scoring form here reads the
  * corpus once per query batch with zero shuffle, which wins whenever
  * the query set is small and fixed (the pipeline-filtering case).
  *
  * Determinism: tf/dl/df are exact integers; avgdl is one double
  * division; idf is driver-computed from exact integers. Scoring is
  * fixed-order IEEE arithmetic, so results are bit-reproducible across
  * partitionings and retries — and replayable in another engine by
  * inlining (idf, avgdl) as literals (see the text_bm25 oracle).
  */
object Bm25 {

  /** k1 (term-frequency saturation) and b (length normalization) —
    * standard defaults 1.2 / 0.75.
    */
  final case class Params(k1: Double = 1.2, b: Double = 0.75)

  /** Corpus-level statistics for a fixed term set: document count,
    * average document length, and per-term (df, idf) aligned with the
    * `terms` sequence they were fitted for.
    */
  final case class Stats(n: Long, avgdl: Double, df: Seq[Long], idf: Seq[Double])

  private def dl(textCol: String): Column =
    size(split(col(textCol), " ")).cast("long")

  /** One aggregate pass over the corpus: N, Σdl, and df per term.
    * Driver-side result is `2 + |terms|` numbers — bounded metadata,
    * never data.
    */
  def fitStats(docs: DataFrame, textCol: String, terms: Seq[String]): Stats = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val aggs = sum(dl(textCol)).as("sumdl") +:
      terms.zipWithIndex.map { case (tm, i) =>
        sum((TokenCount(col(textCol), lit(tm)) > 0).cast("long")).as(s"df$i")
      }
    val row = docs.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = row.getLong(0)
    require(n > 0, "BM25 stats over an empty corpus")
    require(!row.isNullAt(1),
      s"BM25 stats: every $textCol value is NULL — nothing to tokenize")
    val avgdl = row.getLong(1).toDouble / n.toDouble
    val df = terms.indices.map(i => row.getLong(2 + i))
    val idf = df.map(d => math.log(1.0 + (n - d + 0.5) / (d + 0.5)))
    Stats(n, avgdl, df, idf)
  }

  /** Per-term BM25 contribution with every constant pre-resolved to a
    * double literal — the exact expression tree the oracle generator
    * mirrors textually, so cross-engine results are bit-identical.
    */
  private def termScore(tf: Column, dl: Column, idf: Double, avgdl: Double,
                        p: Params): Column =
    lit(idf) * ((tf * lit(p.k1 + 1.0)) /
      (tf + lit(p.k1) * (lit(1.0 - p.b) + (lit(p.b) * dl) / lit(avgdl))))

  /** Top-k documents for the query `terms` under `stats`: one
    * projection-only corpus scan (tf via the codegen kernel), a
    * match-any filter (integer tf sum > 0), and a TakeOrderedAndProject
    * with id tiebreak. Output: idCol, `score` (double), `rank`
    * (1-based BIGINT).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], stats: Stats, k: Int,
           params: Params = Params()): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(stats.idf.length == terms.length,
      s"stats fitted for ${stats.idf.length} terms, query has ${terms.length}")
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      TokenCount(col(textCol), lit(tm)).as(s"tf$i")
    }
    val scored = docs
      .select(col(idCol) +: dl(textCol).as("dl") +: tfCols: _*)
      .where(terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(col(idCol),
        terms.indices.map(i =>
          termScore(col(s"tf$i"), col("dl"), stats.idf(i), stats.avgdl, params))
          .reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    // rank over the k survivors only — a single-partition window whose
    // input is the GlobalLimit(k) above, so its cost is O(k) no matter
    // the corpus size. The `WindowExec: No Partition Defined` warning
    // this emits is benign BY CONSTRUCTION (input ≤ k rows; pinned in
    // BoundedWindowSpec), unlike a global window over raw data.
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol).asc))
        .cast("long"))
  }

  /** DuckDB replay of [[topK]] for the oracle gate: same constants
    * (Double.toString round-trips bit-exactly through DuckDB's
    * parser), same parenthesization, same fold order — so even the
    * double scores hash-match.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
                terms: Seq[String], stats: Stats, k: Int,
                params: Params = Params()): String = {
    def lit(tm: String): String = "'" + tm.replace("'", "''") + "'"
    // DOUBLE literals MUST carry an exponent: DuckDB parses a bare
    // `2.2` as DECIMAL, making `tf * 2.2` exact decimal arithmetic —
    // one ulp off the double product Spark computes. `2.2e0` parses
    // as DOUBLE, and Double.toString round-trips bit-exactly.
    def dlit(x: Double): String = {
      val s = x.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }
    val tfDefs = terms.zipWithIndex.map { case (tm, i) =>
      s"CAST(len(list_filter(string_split($textCol, ' '), x -> x = ${lit(tm)})) AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val perTerm = terms.indices.map { i =>
      s"(${dlit(stats.idf(i))} * ((tf$i * ${dlit(params.k1 + 1.0)}) / " +
        s"(tf$i + ${dlit(params.k1)} * (${dlit(1.0 - params.b)} + " +
        s"(${dlit(params.b)} * dl) / ${dlit(stats.avgdl)}))))"
    }
    val score = perTerm.tail.foldLeft(perTerm.head)((acc, t) => s"($acc + $t)")
    val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH d AS (SELECT $idCol,
    CAST(len(string_split($textCol, ' ')) AS BIGINT) AS dl,
    $tfDefs
  FROM $table),
  s AS (SELECT $idCol, $score AS score FROM d WHERE $anyTf > 0)
SELECT $idCol, score,
  CAST(row_number() OVER (ORDER BY score DESC, $idCol) AS BIGINT) AS rank
FROM s ORDER BY score DESC, $idCol LIMIT $k"""
  }
}
