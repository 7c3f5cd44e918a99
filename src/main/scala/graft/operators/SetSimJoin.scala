package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity self-join (Chaudhuri/Ganti/Kaushik
  * ICDE 2006; Bayardo/Ma/Srikant WWW 2007 "Scaling Up All Pairs" —
  * re-derived as DataFrame joins): ALL pairs of documents whose
  * distinct-token Jaccard similarity is >= tau, found WITHOUT the
  * all-pairs product and WITHOUT recall loss.
  *
  * The prefix-filter theorem: order every document's distinct tokens
  * by a fixed global order (corpus document frequency ascending,
  * rarest first — ties by token); if |A ∩ B| / |A ∪ B| >= tau, then A
  * and B must share at least one token among each one's first
  * p = n - ceil(tau*n) + 1 tokens. So candidates = the equi-join on
  * PREFIX tokens only, and the prefix is precisely the document's
  * RAREST tokens — the join never touches the hot tail that makes the
  * naive posting join quadratic. Candidates are then verified with an
  * exact intersection count.
  *
  * This is the LOSSLESS complement of [[WordJaccard.pairStats]]'s
  * `maxDocFreq` cap (which bounds the same join by dropping hot
  * tokens — explicit recall loss). tau is a RATIONAL (tauNum/tauDen)
  * and every step — ceil via integer division, the threshold via
  * cross-multiplication — is pure integer arithmetic, so the output
  * is bit-deterministic and replays exactly in any engine.
  *
  * Scale shape: one df aggregation (vocabulary-sized), one per-doc
  * rank window (pre-shrunk to distinct (doc, token) rows), a
  * rare-token equi-join for candidates, and a candidate-bounded
  * verification join. No quadratic path; skew lives only in the
  * prefix join and is bounded by the rarest-token frequencies.
  */
object SetSimJoin {

  /** Exact Jaccard-threshold pairs: (a, b, intersection, union_size)
    * with tauDen * intersection >= tauNum * union_size and a < b.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: got $tauNum/$tauDen")
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sized = toks.groupBy("id").agg(count(lit(1)).as("n"))
    // global token order: rarest first, ties by token — both engines
    // rank identically because (df, tok) is a total order
    val ranked = toks.join(dfreq, "tok").join(sized, "id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("tok").asc)))
    // prefix length p = n - ceil(tau*n) + 1, ceil as integer division
    val prefix = ranked
      .where(col("rn") <=
        col("n") - expr(s"(n * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("id"), col("tok"))
    val cand = prefix.as("pa").join(prefix.as("pb"),
        col("pa.tok") === col("pb.tok") && col("pa.id") < col("pb.id"))
      .select(col("pa.id").as("ida"), col("pb.id").as("idb"))
      .distinct()
    val inter = cand
      .join(toks.select(col("id").as("ida"), col("tok")), "ida")
      .join(toks.select(col("id").as("idb"), col("tok")), Seq("idb", "tok"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("intersection"))
    inter
      .join(sized.select(col("id").as("ida"), col("n").as("na")), "ida")
      .join(sized.select(col("id").as("idb"), col("n").as("nb")), "idb")
      .where(lit(tauDen) * col("intersection") >=
        lit(tauNum) * (col("na") + col("nb") - col("intersection")))
      .select(col("ida").as("a"), col("idb").as("b"), col("intersection"),
        (col("na") + col("nb") - col("intersection")).as("union_size"))
  }

  /** DuckDB replay of the identical algorithm over `table`
    * (idExpr/textExpr), for oracle construction.
    */
  def oracleSql(table: String, idExpr: String, textExpr: String,
                tauNum: Int = 1, tauDen: Int = 2): String =
    s"""WITH tk AS (SELECT $idExpr AS id,
          unnest(list_distinct(string_split($textExpr, ' '))) AS tok
        FROM $table),
      dfreq AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok),
      sz AS (SELECT id, count(*) AS n FROM tk GROUP BY id),
      rk AS (SELECT tk.id, tk.tok, sz.n, row_number() OVER (
          PARTITION BY tk.id ORDER BY dfreq.df, tk.tok) AS rn
        FROM tk JOIN dfreq USING (tok) JOIN sz USING (id)),
      pre AS (SELECT id, tok FROM rk
        WHERE rn <= n - ((n * $tauNum + ${tauDen - 1}) // $tauDen) + 1),
      cand AS (SELECT DISTINCT pa.id AS ida, pb.id AS idb
        FROM pre pa JOIN pre pb ON pa.tok = pb.tok AND pa.id < pb.id),
      inter AS (SELECT cand.ida, cand.idb, count(*) AS i
        FROM cand
        JOIN tk ta ON ta.id = cand.ida
        JOIN tk tb ON tb.id = cand.idb AND tb.tok = ta.tok
        GROUP BY 1, 2),
      ok AS (SELECT inter.ida AS a, inter.idb AS b, inter.i,
          na.n + nb.n - inter.i AS u
        FROM inter JOIN sz na ON na.id = inter.ida
                   JOIN sz nb ON nb.id = inter.idb
        WHERE $tauDen * inter.i >= $tauNum * (na.n + nb.n - inter.i))
    SELECT a, b, CAST(i AS BIGINT) AS intersection,
      CAST(u AS BIGINT) AS union_size FROM ok"""
}
