package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact pairwise word-set Jaccard statistics via a token-posting
  * self-equi-join — the n-gram-Jaccard dedup case with integer
  * outputs (no division, oracle-friendly).
  *
  * Scale posture: a token shared by d documents contributes d^2 rows to
  * the self-join, so one stopword across 10^6 docs would explode to
  * 10^12 join rows. `maxDocFreq` bounds that structurally: tokens whose
  * document frequency exceeds the cap are dropped from the vocabulary
  * BEFORE the join (the standard posting-list prune — ultra-common
  * tokens carry no similarity signal), making the join cost at most
  * sum over kept tokens of df^2 <= maxDocFreq x total postings. All
  * statistics (inter AND the per-doc set sizes behind uni) are computed
  * over the same capped vocabulary, so the Jaccard stays self-consistent;
  * with a cap above the corpus's true max df the output is bit-identical
  * to the uncapped computation.
  */
object WordJaccard {

  /** (a, b, inter, uni) for every document pair sharing at least one
    * kept token; a < b, counts over distinct words of df <= maxDocFreq.
    */
  def pairStats(docs: DataFrame, idCol: String, textCol: String,
                maxDocFreq: Long = 1000L): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val tok = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
    val keptVocab = tok.groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq).select("w")
    // kept postings feed BOTH the join and the per-doc sizes, and are
    // read three times — materialize once
    val kept = tok.join(keptVocab, Seq("w")).localCheckpoint(eager = false)
    val cnt = kept.groupBy("id").agg(count(lit(1)).as("n"))
    kept.as("x").join(kept.as("y"),
        col("x.w") === col("y.w") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(cnt.select(col("id").as("a"), col("n").as("na")), Seq("a"))
      .join(cnt.select(col("id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
  }
}
