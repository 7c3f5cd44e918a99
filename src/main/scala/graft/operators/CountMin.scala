package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch frequency estimation (Cormode/Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications") — bounded-memory approximate counts over unbounded
  * key cardinality: depth x width counters, point estimate = min over
  * depth hashed buckets, one-sided error (never underestimates,
  * overestimate <= 2N/width with probability 1 - 2^-depth).
  *
  * Why this sketch gets a hash-exact oracle when HLL++ stays
  * rows-only (q_sketch_distinct): CMS is a LINEAR sketch — counters
  * are plain integer sums over data-independent hash functions, so
  * the result is merge-order independent BY ALGEBRA (commutative
  * integer addition), not just by implementation discipline. The
  * whole computation — hashing, bucketing, summing, the min over
  * depth rows — replays in DuckDB integer arithmetic bit-for-bit.
  *
  * Scale shape: the build is one partial-aggregated shuffle whose
  * group count is capped at depth*width (counters, not keys — the
  * map side combines the unbounded key stream into <= depth*width
  * partials per task); estimates probe depth buckets per query key
  * via a broadcast of the literal probe table. Linearity also means
  * shard sketches ADD: build per partition/day/shard, sum counters to
  * query any union — the property the merge test pins.
  *
  * Hash family: h_i(x) = ((a_i * (x mod P) + b_i) mod P) mod width,
  * P = 2^31-1, with the same seed-derived (a_i, b_i) constants as the
  * MinHash permutations ([[graft.expressions.TextHashing.minhashPerms]]).
  * Exact on the non-negative key domain (documented; negative keys
  * would floor-vs-truncate differently across engines).
  */
object CountMin {

  /** 2^31 - 1, the Mersenne prime the hash family reduces modulo. */
  val P: Long = 2147483647L

  final case class Params(depth: Int = 4, width: Int = 2048,
                          seed: Long = 42L) {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
  }

  /** Seed-derived (a_i, b_i) per depth row — data-independent plan
    * constants, like the LSH hyperplanes.
    */
  def perms(p: Params): Seq[(Long, Long)] =
    graft.expressions.TextHashing.minhashPerms(p.seed, p.depth)
      .grouped(2).map(x => (x(0), x(1))).toSeq

  private def bucket(key: Column, a: Long, b: Long, width: Int): Column =
    pmod(pmod(lit(a) * pmod(key, lit(P)) + lit(b), lit(P)), lit(width.toLong))

  /** Driver-side mirror of [[bucket]] for probe literals and oracles. */
  def bucketOf(key: Long, a: Long, b: Long, width: Int): Long =
    ((a * (key % P) + b) % P) % width

  /** Schema-metadata tag carried on the `cnt` field so sketches are
    * self-describing: merging shards built under DIFFERENT Params
    * (depth/width/seed) would sum counters from incompatible hash
    * families into a silently wrong sketch whose min can
    * UNDERestimate — breaking the one-sided-error guarantee.
    */
  private def paramsMeta(p: Params) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.cms.depth", p.depth.toLong)
    .putLong("graft.cms.width", p.width.toLong)
    .putLong("graft.cms.seed", p.seed)
    .build()

  private def paramsOf(df: DataFrame): Option[Params] = {
    val m = df.schema("cnt").metadata
    if (m.contains("graft.cms.depth"))
      Some(Params(m.getLong("graft.cms.depth").toInt,
        m.getLong("graft.cms.width").toInt, m.getLong("graft.cms.seed")))
    else None
  }

  /** Builds the counter table (row, col, cnt) — at most depth*width
    * rows regardless of input size or key cardinality. The Params are
    * stamped into the `cnt` field's schema metadata so a later
    * [[merge]] can verify shard compatibility.
    */
  def build(df: DataFrame, keyCol: String, p: Params = Params()): DataFrame = {
    val rows = perms(p).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(col(keyCol), a, b, p.width).as("col"))
    }
    df.select(explode(array(rows: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt", paramsMeta(p)))
  }

  /** Merges shard sketches built with the SAME Params: counters add
    * (linearity), so per-partition/day/shard sketches combine into
    * any union's sketch without touching the data again — the
    * incremental-build shape for a partitioned 100 TB corpus.
    * Every shard must carry [[build]]'s Params stamp and they must
    * all match: summing counters from different hash families is a
    * silently wrong sketch (its min can underestimate), so that is a
    * loud error here, not a wrong answer downstream.
    */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    val stamps = sketches.map(paramsOf)
    require(stamps.forall(_.isDefined),
      "merge requires sketches built by CountMin.build (missing Params stamp)")
    require(stamps.flatten.distinct.size == 1,
      s"merge requires identical Params across shards, got: ${stamps.flatten.distinct.mkString(", ")}")
    sketches.reduce(_ union _)
      .groupBy("row", "col")
      .agg(sum(col("cnt")).as("cnt", paramsMeta(stamps.head.get)))
  }

  /** Point estimates for literal `keys`: (key, cm_est BIGINT), one row
    * per key, cm_est = min over the depth probed counters (0 for a
    * never-hit bucket).
    */
  def estimate(counters: DataFrame, keys: Seq[Long],
               p: Params = Params()): DataFrame = {
    require(keys.nonEmpty, "estimate needs at least one key")
    require(keys.forall(_ >= 0), "CMS hash family is defined on keys >= 0")
    val spark = counters.sparkSession
    import spark.implicits._
    val probes = for {
      k <- keys
      (ab, i) <- perms(p).zipWithIndex
    } yield (k, i, bucketOf(k, ab._1, ab._2, p.width))
    val probeDf = probes.toDF("key", "row", "col")
    // probes LEFT JOIN broadcast(counters): the outer side must be the
    // probe list (empty buckets estimate 0), and only the inner side
    // can be the broadcast build side — counters are <= depth*width
    // rows by construction, always broadcastable
    probeDf.join(broadcast(counters), Seq("row", "col"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Point estimates for EVERY key in `keysDf.keyCol` — the
    * distributed probe (no driver-side key list, unlike [[estimate]]):
    * each key row expands to its depth bucket coordinates in one
    * projection, joins the broadcast counter table, and takes the min.
    * Output (keyCol, cm_est BIGINT). The heavy-hitter shape: candidate
    * keys come from the sketch (one-sided error ⇒ a deterministic
    * SUPERSET of the true heavy hitters), then only candidates pay for
    * exact verification.
    */
  def estimateAll(counters: DataFrame, keysDf: DataFrame, keyCol: String,
                  p: Params = Params()): DataFrame = {
    val rows = perms(p).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), bucket(col(keyCol), a, b, p.width).as("col"))
    }
    keysDf.select(col(keyCol), explode(array(rows: _*)).as("rc"))
      .select(col(keyCol), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(broadcast(counters), Seq("row", "col"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** DuckDB replay of build + [[estimateAll]] over relation `rel`'s
    * `keyExpr`, as a CTE block: counter sums, distinct keys, per-key
    * probe rows, and `__est(__k, cm_est)`. Callers embed it in a WITH
    * and select from `__est`.
    */
  def oracleAllKeysSql(rel: String, keyExpr: String,
                       p: Params = Params()): String = {
    val cRows = perms(p).zipWithIndex.map { case ((a, b), i) =>
      s"SELECT $i AS row, (($a * (($keyExpr) % $P) + $b) % $P) % ${p.width} AS col, " +
        s"count(*) AS cnt FROM $rel GROUP BY 2"
    }.mkString("\n      UNION ALL ")
    val pRows = perms(p).zipWithIndex.map { case ((a, b), i) =>
      s"SELECT __k, $i AS row, (($a * (__k % $P) + $b) % $P) % ${p.width} AS col FROM __dk"
    }.mkString("\n      UNION ALL ")
    s"""__c AS ($cRows),
      __dk AS (SELECT DISTINCT ($keyExpr) AS __k FROM $rel),
      __p AS ($pRows),
      __est AS (SELECT __k, CAST(min(coalesce(__c.cnt, 0)) AS BIGINT) AS cm_est
        FROM __p LEFT JOIN __c ON __c.row = __p.row AND __c.col = __p.col
        GROUP BY __k)"""
  }

  /** DuckDB replay of build+estimate over `table.keyExpr` for the
    * oracle gate: per-depth-row bucket sums unioned, probe literals
    * precomputed with [[bucketOf]], LEFT JOIN + coalesce for empty
    * buckets — all integer arithmetic.
    */
  def oracleSql(table: String, keyExpr: String, keys: Seq[Long],
                p: Params = Params()): String = {
    val rows = perms(p).zipWithIndex.map { case ((a, b), i) =>
      s"SELECT $i AS row, (($a * (($keyExpr) % $P) + $b) % $P) % ${p.width} AS col, " +
        s"count(*) AS cnt FROM $table GROUP BY 2"
    }.mkString("\n      UNION ALL ")
    val probeRows = (for {
      k <- keys
      (ab, i) <- perms(p).zipWithIndex
    } yield s"($k, $i, ${bucketOf(k, ab._1, ab._2, p.width)})").mkString(", ")
    s"""WITH c AS ($rows),
      probes(key, row, col) AS (VALUES $probeRows)
    SELECT CAST(probes.key AS BIGINT) AS key,
      CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cm_est
    FROM probes LEFT JOIN c ON c.row = probes.row AND c.col = probes.col
    GROUP BY probes.key"""
  }
}
