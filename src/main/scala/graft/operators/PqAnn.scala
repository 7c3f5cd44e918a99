package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product-quantized approximate nearest neighbor — the memory half of
  * Jegou/Douze/Schmid, "Product quantization for nearest neighbor
  * search" (TPAMI 2011): each L2-normalized vector is split into `m`
  * subvectors, each subvector is replaced by the id of its nearest
  * per-subspace centroid, and the whole vector becomes an m-byte code.
  * With m=8 subspaces of 16 centroids the 64-float (256 B) embedding
  * compresses to one packed 32-bit code inside a LONG — a ~64x smaller
  * corpus representation, which at 100 TB is the difference between
  * scanning embeddings and scanning codes.
  *
  * Search is asymmetric distance computation (ADC): the query stays
  * exact; a candidate's score is the sum over subspaces of
  * dot(query subvector, centroid selected by the candidate's code).
  * Vectors are normalized up front, so the inner product IS cosine and
  * recall is measured against the exact cosine baseline (RecallSpec).
  *
  * Scale shape:
  *  - training: `iterations` passes over ALL m subspaces AT ONCE (one
  *    explode + one (sub, cell, pos)-keyed partial-aggregated shuffle
  *    per pass — not m separate k-means jobs); codebooks are m x ksub
  *    x dsub doubles of driver-side metadata shipped as plan literals.
  *  - encoding: one projection per corpus row (m CASE-free argmaxes of
  *    ksub dim-dsub codegen'd dots), emitting the packed code.
  *  - search: broadcast the (small) query set; the corpus-side scan
  *    reads only (id, code) — the compressed representation — and the
  *    per-candidate score is m literal-codebook lookups + dim-dsub
  *    dots.
  *
  * Determinism: identical machinery to [[IvfAnn]] — init = subvectors
  * of the ksub lowest-id vectors, cell sums accumulate fixed-point
  * DECIMAL(38,0) (exact + commutative), so codebooks are bit-identical
  * under any partitioning; that is what licenses the codebook-inlined
  * DuckDB oracle for pq_ann_topk.
  */
object PqAnn {

  /** @param m subspaces; dim must be divisible by m
    * @param ksub centroids per subspace (<= 16 so the packed code fits
    *   4 bits per subspace)
    */
  final case class Params(m: Int = 8, ksub: Int = 16, iterations: Int = 3) {
    require(m >= 1 && ksub >= 2 && ksub <= 16,
      s"need 1 <= m and 2 <= ksub <= 16 (4-bit packed codes), got m=$m ksub=$ksub")
  }

  /** v / |v| as a double array column; null-safe only for nonzero
    * norms (degenerate zero vectors are a data error for cosine ANN).
    */
  private def normalized(vecCol: Column): Column = {
    val v = VectorFunctions.toDoubleArray(vecCol)
    val n = sqrt(VectorFunctions.dot(v, v))
    transform(v, x => x / n)
  }

  private def subvec(vn: Column, sub: Int, dsub: Int): Column =
    slice(vn, sub * dsub + 1, dsub)

  /** argmax_c (dot(x, c) - |c|^2/2) over the subspace codebook — ties
    * to the HIGHEST cell (array_max over struct is lexicographic),
    * mirrored by the oracle's high-to-low CASE ladder.
    */
  private def argmaxCell(x: Column, codebook: Array[Array[Double]]): Column =
    array_max(array(codebook.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(
        (VectorFunctions.dot(x, array(c.toIndexedSeq.map(lit): _*)) -
          lit(c.map(d => d * d).sum / 2.0)).as("score"),
        lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Per-subspace k-means codebooks, all subspaces trained together:
    * each Lloyd pass is ONE job over (id, sub, subvector) rows with a
    * (sub, cell, pos)-keyed exact-decimal sum — m x ksub x dsub
    * driver-side doubles out.
    */
  def fitCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                   p: Params = Params()): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % p.m == 0, s"dim $dim not divisible by m=${p.m}")
    val dsub = dim / p.m

    val base = corpus.select(col(idCol).as("id"), normalized(col(vecCol)).as("vn"))
      .localCheckpoint(eager = false) // reused across iterations
    // init: subvectors of the ksub lowest-id vectors, per subspace
    val initRows = base.orderBy(col("id")).limit(p.ksub)
      .collect().map(_.getSeq[Double](1).toArray)
    var codebooks = Array.tabulate(p.m) { s =>
      initRows.map(v => v.slice(s * dsub, s * dsub + dsub))
    }

    val subRows = base.select(col("id"),
        explode(array((0 until p.m).map { s =>
          struct(lit(s).as("sub"), subvec(col("vn"), s, dsub).as("x"))
        }: _*)).as("sx"))
      .select(col("id"), col("sx.sub").as("sub"), col("sx.x").as("x"))
      .localCheckpoint(eager = false)

    val Scale = (1L << 30).toDouble
    for (_ <- 1 to p.iterations) {
      // per-subspace cell assignment: the sub column selects which
      // codebook's argmax applies
      val cellExpr = (0 until p.m).foldLeft(lit(-1): Column) { (acc, s) =>
        when(col("sub") === s, argmaxCell(col("x"), codebooks(s))).otherwise(acc)
      }
      val sums = subRows.withColumn("cell", cellExpr)
        .select(col("sub"), col("cell"), posexplode(col("x")).as(Seq("pos", "xv")))
        .groupBy("sub", "cell", "pos")
        .agg(sum(floor(col("xv") * Scale + 0.5).cast(DecimalType(38, 0))).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val acc = Array.fill(p.m, p.ksub)(new Array[java.math.BigDecimal](dsub))
      val cnt = Array.fill(p.m)(new Array[Long](p.ksub))
      sums.foreach { r =>
        val s = r.getAs[Int]("sub"); val c = r.getAs[Int]("cell")
        acc(s)(c)(r.getAs[Int]("pos")) = r.getAs[java.math.BigDecimal]("sx")
        cnt(s)(c) = r.getAs[Long]("n")
      }
      codebooks = codebooks.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (old, c) =>
          if (cnt(s)(c) == 0) old
          else acc(s)(c).map(_.doubleValue / Scale / cnt(s)(c))
        }
      }
    }
    codebooks
  }

  /** (idCol, code) — the packed 4-bit-per-subspace PQ code as a LONG
    * (subspace s occupies bits [4s, 4s+4)).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = codebooks(0)(0).length
    val vn = normalized(col(vecCol))
    val packed = codebooks.zipWithIndex.map { case (cb, s) =>
      argmaxCell(subvec(vn, s, dsub), cb).cast("long") * (1L << (4 * s))
    }.reduce(_ + _)
    corpus.select(col(idCol), packed.as("code"))
  }

  /** Approximate top-k by ADC cosine: queries exact (broadcast), the
    * corpus represented ONLY by its codes. Output (qid, nid, rank),
    * rank by (adc score DESC, nid ASC).
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding",
           p: Params = Params()): DataFrame = {
    val codebooks = fitCodebooks(corpus, idCol, vecCol, p)
    val dsub = codebooks(0)(0).length
    val coded = encode(corpus, idCol, vecCol, codebooks)
      .select(col(idCol).as("nid"), col("code"))
    val q = queries.select(col(idCol).as("qid"), normalized(col(vecCol)).as("qn"))

    val score = codebooks.zipWithIndex.map { case (cb, s) =>
      val cell = shiftright(col("code"), 4 * s).bitwiseAND(lit(15L)).cast("int")
      VectorFunctions.dot(
        subvec(col("qn"), s, dsub),
        element_at(typedLit(cb.map(_.toSeq).toSeq), cell + 1))
    }.reduce(_ + _)

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc").desc, col("nid").asc)
    coded.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), score.as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank")
  }
}
