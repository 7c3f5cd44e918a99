package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed second-moment statistics over an embedding column —
  * the covariance / leading-component prelude of embedding-space
  * pipelines (whitening before SemDedup-style clustering, feature
  * redundancy audits, PCA-guided dimension pruning).
  *
  * Scale shape: exact covariance of d dims over n rows is inherently
  * O(n·d²) multiply-adds, but it is ONE scan — each row fans out to
  * its d·(d+1)/2 upper-triangle products via two generators, partial
  * aggregation folds them per partition, and the shuffle moves only
  * (#partitions × d²) sum rows, never data (the PqAnn training-sums
  * shape). d=64 → 2 080 pair groups; at 100 TB nothing but the scan
  * grows.
  *
  * Cross-engine exactness (the DuckDB oracle hash-matches doubles):
  * floats widen to double exactly, a product of two widened floats is
  * exact in double (24-bit mantissas), and each product is quantized
  * to an INTEGER (floor(x·2²⁴+0.5)) summed in DECIMAL — sums are then
  * order-independent and bit-equal across engines, and every sum stays
  * far below 2⁵³ at fixture scale so the final cast-to-double is
  * exact. The quantization (~2⁻²⁵ per term) is the declared semantic,
  * not noise. DECIMAL(38,0) keeps the pattern overflow-safe at 100 TB
  * row counts where a BIGINT sum could wrap.
  */
object EmbedStats {

  /** Fixed-point scale: 2^24 — products of unit-ish embedding values
    * quantize exactly into doubles and sums stay < 2^53 (exact in
    * double) up to ~10^8 rows per group; beyond that only the final
    * cast rounds, identically in both engines.
    */
  val Scale: Double = 16777216.0

  private def q(c: Column): Column =
    floor(c * Scale + 0.5).cast(DecimalType(38, 0))

  /** (i, x) per row — embedding elements widened to double BEFORE any
    * arithmetic so every product below is exact.
    */
  private def exploded(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        col("xf").cast("double").as("x"))

  /** Per-dimension quantized sums: (i, sx DECIMAL, n). */
  def dimSums(embeddings: DataFrame): DataFrame =
    exploded(embeddings).groupBy("i")
      .agg(sum(q(col("x"))).as("sx"), count(lit(1)).as("n"))

  /** Upper-triangle pair sums (i < j): (i, j, sxy DECIMAL, n). The
    * double-generator fan-out: row → d (i, xi) rows → d²/2 pairs,
    * folded by partial aggregation before any exchange.
    */
  def pairSums(embeddings: DataFrame): DataFrame =
    pairSumsImpl(embeddings, includeDiagonal = false)

  /** Shared fan-out aggregation; `includeDiagonal` widens the triangle
    * predicate to j >= i so [[covMatrix]] gets E[x_i²] from the SAME
    * one-scan job (the j == i product IS x², quantized identically)
    * instead of a second dedicated pass. [[pairSums]]'s declared
    * i < j surface is unchanged.
    */
  private def pairSumsImpl(embeddings: DataFrame,
                           includeDiagonal: Boolean): DataFrame =
    embeddings.select(col("embedding"),
        posexplode(col("embedding")).as(Seq("i", "xif")))
      .select(col("i").cast("long").as("i"),
        col("xif").cast("double").as("xi"),
        posexplode(col("embedding")).as(Seq("j", "xjf")))
      .where(if (includeDiagonal) col("j") >= col("i") else col("j") > col("i"))
      .select(col("i"), col("j").cast("long").as("j"),
        (col("xi") * col("xjf").cast("double")).as("xy"))
      .groupBy("i", "j")
      .agg(sum(q(col("xy"))).as("sxy"), count(lit(1)).as("n"))

  /** cov(i,j) as the IDENTICAL double formula the oracle states:
    * sxy/S/n − (sxi/S/n)·(sxj/S/n) — left-associated divisions on
    * exactly-converted decimal sums, so both engines produce the same
    * bits.
    */
  def covCol(sxy: Column, n: Column, sxi: Column, ni: Column,
             sxj: Column, nj: Column): Column =
    sxy.cast("double") / Scale / n -
      (sxi.cast("double") / Scale / ni) * (sxj.cast("double") / Scale / nj)

  /** Per-class first/second-moment stats: (label, i, sx, sxx, n) in
    * the same quantized-DECIMAL domain — the classification-dataset
    * diagnostic (class centroids + per-dimension dispersion) behind
    * nearest-class-mean baselines and class-balance audits. One scan,
    * partial-agg'd to labels×d sum rows; at 100 TB only the scan
    * grows. Output stays PER-DIMENSION (no cross-dim double sums), so
    * every value is bit-identical across engines and partitionings.
    */
  def labelDimStats(embeddings: DataFrame, labelCol: String): DataFrame =
    embeddings.select(col(labelCol).cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("label"), col("i").cast("long").as("i"),
        col("xf").cast("double").as("x"))
      .groupBy("label", "i")
      .agg(sum(q(col("x"))).as("sx"),
        sum(q(col("x") * col("x"))).as("sxx"),
        count(lit(1)).as("n"))

  /** mean = sx/S/n with the exact division order the oracle states. */
  def meanCol(sx: Column, n: Column): Column =
    sx.cast("double") / Scale / n

  /** var = sxx/S/n − mean² — same left-associated IEEE ops as SQL. */
  def varCol(sxx: Column, sx: Column, n: Column): Column =
    sxx.cast("double") / Scale / n - meanCol(sx, n) * meanCol(sx, n)

  /** Full covariance matrix on the driver — d² doubles, the bounded
    * ANN-training-sums collect, never corpus rows.
    */
  def covMatrix(embeddings: DataFrame): Array[Array[Double]] = {
    val dims = dimSums(embeddings).collect()
      .map(r => r.getLong(0).toInt ->
        (r.getDecimal(1).doubleValue(), r.getLong(2))).toMap
    val d = dims.size
    val mu = Array.tabulate(d)(i => dims(i)._1 / Scale / dims(i)._2)
    val a = Array.ofDim[Double](d, d)
    // diagonal folded into the pair pass (j >= i): the j == i product
    // is exactly x², quantized by the same q() the old dedicated
    // diagonal aggregation used — identical decimal sums, identical
    // double formula, one fewer Spark action per covMatrix call
    pairSumsImpl(embeddings, includeDiagonal = true).collect().foreach { r =>
      val i = r.getLong(0).toInt
      val j = r.getLong(1).toInt
      val c = r.getDecimal(2).doubleValue() / Scale / r.getLong(3) -
        mu(i) * mu(j)
      a(i)(j) = c
      a(j)(i) = c
    }
    a
  }

  /** Leading eigenpair by power iteration on the driver-side d×d
    * matrix (O(iters·d²) flops — microseconds at d=64). Deterministic:
    * fixed uniform start vector, residual-driven stop (covariance is
    * PSD so there is no ±λ oscillation mode; near-tied leading
    * eigenvalues still converge in residual because any unit vector of
    * the leading invariant subspace is an eigenvector).
    */
  def topEigen(a: Array[Array[Double]], tol: Double = 1e-9,
               maxIters: Int = 20000): (Double, Array[Double]) = {
    val d = a.length
    def mul(v: Array[Double]): Array[Double] = Array.tabulate(d)(i =>
      (0 until d).foldLeft(0.0)((s, j) => s + a(i)(j) * v(j)))
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var it = 0
    var done = false
    while (it < maxIters && !done) {
      val av = mul(v)
      val nrm = math.sqrt(av.map(x => x * x).sum)
      if (nrm == 0.0) done = true
      else {
        val nv = av.map(_ / nrm)
        val anv = mul(nv)
        val lam = (0 until d).foldLeft(0.0)((s, i) => s + nv(i) * anv(i))
        v = nv
        if (residual(a, lam, nv) <= tol) done = true
      }
      it += 1
    }
    val av = mul(v)
    val lambda = (0 until d).foldLeft(0.0)((s, i) => s + v(i) * av(i))
    (lambda, v)
  }

  /** Relative residual ‖Av − λv‖₂ / |λ| — the convergence gate. */
  def residual(a: Array[Array[Double]], lambda: Double,
               v: Array[Double]): Double = {
    val d = a.length
    val r = Array.tabulate(d)(i =>
      (0 until d).foldLeft(0.0)((s, j) => s + a(i)(j) * v(j)) - lambda * v(i))
    math.sqrt(r.map(x => x * x).sum) / math.max(math.abs(lambda), 1e-300)
  }
}
