package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sorted-neighborhood near-duplicate detection (the merge/purge
  * method of Hernández & Stolfo, SIGMOD 1995): sort the corpus by a
  * blocking key, compare each record only with its `window` successors
  * in sort order, and verify candidates with exact word-set Jaccard.
  * The classic third blocking family next to banded MinHash
  * ([[MinHashLSH]]) and prefix filtering ([[SetSimJoin]]) — linear
  * candidate volume O(n * window) by construction, and strongest when
  * near-duplicates share sort-key prefixes (here: the text itself).
  *
  * Scale shape:
  *  1. the global sort RANK comes from [[PrefixSum.cumulative]] —
  *     range-sharded, no single-task global window;
  *  2. candidate generation joins RANK AGAINST RANK+d over id/rank
  *     rows only — the text column is never replicated `window`
  *     times;
  *  3. each candidate pair fetches its two texts by id join and
  *     verifies with `array_intersect` over distinct-token arrays —
  *     a narrow per-row expression, no token-level explosion
  *     (contrast [[WordJaccard.pairStats]], whose token equi-join is
  *     the all-pairs-capable path).
  *
  * Output: (a, b, inter, uni) with a < b, exact integer intersection
  * and union sizes of the distinct word sets, filtered to
  * inter/uni >= minJaccardNum/minJaccardDen (cross-multiplied — no
  * float division).
  */
object SortedNeighborhood {

  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   window: Int,
                   minJaccardNum: Int = 1, minJaccardDen: Int = 2): DataFrame = {
    require(window >= 1 && window <= 64,
      s"window must be in [1, 64], got $window")
    require(minJaccardDen > 0 && minJaccardNum >= 0,
      s"bad threshold $minJaccardNum/$minJaccardDen")

    val ranked = PrefixSum.cumulative(
        df.select(col(idCol), col(textCol)).withColumn("__one", lit(1L)),
        orderCols = Seq(textCol, idCol), valueCol = "__one")
      .select(col(idCol), col("cum").as("__rank"))

    // light candidate pairs: (id_a, id_b) via rank -> rank+d equi-join
    val lhs = ranked
      .withColumn("__d", explode(array((1 to window).map(lit): _*)))
      .select(col(idCol).as("__ida"), (col("__rank") + col("__d")).as("__target"))
    val cand = lhs.join(ranked.select(col(idCol).as("__idb"),
        col("__rank").as("__target")), Seq("__target"))
      .select(col("__ida"), col("__idb"))

    // exact verify: fetch both texts by id, intersect distinct tokens
    def toks(c: Column): Column = array_distinct(split(c, " "))
    val ta = df.select(col(idCol).as("__ida"), toks(col(textCol)).as("__ta"))
    val tb = df.select(col(idCol).as("__idb"), toks(col(textCol)).as("__tb"))
    val inter = size(array_intersect(col("__ta"), col("__tb"))).cast(LongType)
    val uni = (size(col("__ta")) + size(col("__tb"))).cast(LongType) - inter

    cand.join(ta, Seq("__ida")).join(tb, Seq("__idb"))
      .select(
        least(col("__ida"), col("__idb")).as("a"),
        greatest(col("__ida"), col("__idb")).as("b"),
        inter.as("inter"), uni.as("uni"))
      .where(col("inter") * minJaccardDen >= col("uni") * minJaccardNum)
  }
}
