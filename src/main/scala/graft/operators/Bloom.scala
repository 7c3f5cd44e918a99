package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership (Bloom 1970) for corpus decontamination at
  * scale: build the filter over the PROTECTED set's key hashes (e.g.
  * benchmark/test-split fingerprints), broadcast it, and gate the
  * training corpus with a scan-side membership test — no shuffle of
  * the big side, which is the whole point: an exact semi-join
  * decontamination pass shuffles the full training corpus on the key;
  * the bloom pass ships <= `bits` positions (KBs-to-MBs) to every
  * executor and the corpus is only scanned. One-sided error in the
  * SAFE direction for this use: no false negatives (real
  * contamination always flagged), small false-positive rate (a clean
  * doc occasionally dropped — acceptable for training data).
  *
  * The filter is represented as its SET-BIT POSITION SET (<= bits
  * longs), not packed words: semantically identical, join-able in any
  * engine, and free of cross-engine 64-bit shift/sign pitfalls — so
  * build + membership replay exactly in DuckDB integer arithmetic
  * (the dedup_bloom_decontam oracle). Hash family: the same
  * seed-derived (a_i, b_i) affine family as CountMin/MinHash,
  * h_i(x) = ((a_i * (x mod P) + b_i) mod P) mod bits, P = 2^31-1.
  */
object Bloom {

  val P: Long = 2147483647L

  /** Sized for a visible-but-small FP rate on the fixture corpus
    * (n set bits ~ hashes * |protected|; FP rate ~ (n/bits)^hashes).
    */
  final case class Params(bits: Int = 8192, hashes: Int = 3,
                          seed: Long = 7L) {
    require(bits >= 64, s"bits must be >= 64, got $bits")
    require(hashes >= 1 && hashes <= 16,
      s"hashes must be in [1,16], got $hashes")
  }

  def perms(p: Params): Seq[(Long, Long)] =
    graft.expressions.TextHashing.minhashPerms(p.seed, p.hashes)
      .grouped(2).map(x => (x(0), x(1))).toSeq

  /** Keys must be NON-NULL on both sides: a NULL key hashes to NULL
    * probe positions, which join nothing — on the build side it would
    * silently insert nothing, and on the probe side it would silently
    * read as a non-member, breaching the no-false-negatives contract.
    * Enforced per row with a loud raise_error woven into the hash
    * expressions (fingerprint your nullable column, or filter NULLs
    * explicitly, before calling).
    */
  private def posExprs(key: Column, p: Params): Seq[Column] = {
    val k = when(key.isNotNull, key).otherwise(raise_error(lit(
      "Bloom keys must be non-null: a NULL key probes NULL positions " +
        "and would silently read as a non-member (false negative)")))
    perms(p).map { case (a, b) =>
      pmod(pmod(lit(a) * pmod(k, lit(P)) + lit(b), lit(P)),
        lit(p.bits.toLong))
    }
  }

  /** The filter: distinct set-bit positions of every key's `hashes`
    * probes — at most `bits` rows regardless of input size.
    */
  def bitset(df: DataFrame, keyCol: String, p: Params = Params()): DataFrame =
    df.select(explode(array(posExprs(col(keyCol), p): _*)).as("pos"))
      .distinct()

  /** (idCol, bloom_hit BOOLEAN): true iff ALL probed positions of the
    * row's key are set in `bits` — one row per distinct id. ONE scan
    * of the probed side: the exploded (id, pos) probes are
    * deduplicated (so repeated ids and self-colliding hash positions
    * cannot distort the count — a duplicated member id must never
    * read as a non-member; no-false-negatives is the contract),
    * LEFT-joined to the broadcast bitset with a hit marker, and
    * reduced per id with `count(hit) == count(*)`. Ids must identify
    * a key (one key per id; duplicate (id, key) ROWS are fine).
    */
  def mightContain(df: DataFrame, idCol: String, keyCol: String,
                   bits: DataFrame, p: Params = Params()): DataFrame =
    df.select(col(idCol), explode(array(posExprs(col(keyCol), p): _*)).as("pos"))
      .distinct()
      .join(broadcast(bits.withColumn("__hit", lit(1))), Seq("pos"), "left")
      .groupBy(idCol)
      .agg((count(col("__hit")) === count(lit(1))).as("bloom_hit"))

  /** SQL fragment list mirroring [[posExprs]] over `keyExpr` (non-
    * negative domain), for oracle construction.
    */
  def posSql(keyExpr: String, p: Params): Seq[String] =
    perms(p).map { case (a, b) =>
      s"(($a * (($keyExpr) % $P) + $b) % $P) % ${p.bits}"
    }
}
