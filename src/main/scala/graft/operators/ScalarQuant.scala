package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType}

/** Int8 scalar quantization (SQ8) for embedding columns — the
  * standard 4x memory/scan-bandwidth reduction for vector search at
  * corpus scale (FAISS `SQ8` / Milvus `SQ8` index family): every
  * float32 dimension is mapped to an integer level in [-127, 127]
  * with ONE corpus-trained scale, and similarity search ranks by the
  * cosine of the quantized vectors.
  *
  * Where it sits in the ANN family here: brute float cosine
  * ([[Similarity]]) is the exact baseline, SQ8 keeps brute-force
  * scan shape but cuts bytes 4x with ~1-2% recall loss, PQ/IVF-PQ
  * ([[PqAnn]]) trade further recall for 32x+ compression. SQ8 is the
  * right first step when the corpus fits scan budget but not RAM.
  *
  * Quantization: q_i = floor(x_i * 127 / maxAbs + 0.5), with maxAbs
  * the corpus-wide max |x_i| (symmetric, zero-preserving). The
  * arithmetic is done in DOUBLE and the levels kept as
  * integer-valued doubles: every dot/norm over them is a sum of
  * exact integers below 2^53, so scores are bit-identical across
  * engines and summation orders — the property the DuckDB oracle
  * relies on.
  *
  * Scale posture: [[fitMaxAbs]] is one all-reduce over the corpus
  * (a 1-row aggregate — fit-once, persist alongside the index like
  * [[IvfAnn]] centroids); quantization itself is a narrow projection
  * at the scan; search is a TakeOrderedAndProject over the quantized
  * scan with the 1-row scale and query vector broadcast — no shuffle
  * of the corpus at any point.
  */
object ScalarQuant {

  /** Corpus-wide symmetric scale: 1-row DataFrame (m DOUBLE). */
  def fitMaxAbs(df: DataFrame, vecCol: String): DataFrame =
    df.agg(max(array_max(transform(
      VectorFunctions.toDoubleArray(col(vecCol)), x => abs(x)))).as("m"))

  /** Quantized levels as integer-valued doubles (see scaladoc). */
  def quantize(vec: Column, maxAbs: Column): Column =
    transform(VectorFunctions.toDoubleArray(vec),
      x => floor(x * 127.0 / maxAbs + 0.5).cast(DoubleType))

  /** A fitted SQ8 index: the corpus-wide scale plus the corpus at
    * int8 levels — the ACTUAL 4x storage form ([[save]] writes
    * `array<tinyint>` parquet; levels round-trip byte→double exactly,
    * so a loaded index searches bit-identically to the fitted one).
    */
  final case class Index(maxAbs: Double, quantized: DataFrame)

  /** Fit-once path: one corpus all-reduce for the scale (a single
    * scalar — the only driver-side value), then a narrow quantize
    * projection. At 100 TB this is the per-corpus-version cost;
    * searches amortize it via [[save]]/[[load]].
    */
  def fitIndex(df: DataFrame, idCol: String, vecCol: String): Index = {
    val m = fitMaxAbs(df, vecCol).head().getDouble(0)
    require(m > 0, "SQ8 fit: corpus max |x| must be positive")
    Index(m, df.select(col(idCol).as("nid"),
      quantize(col(vecCol), lit(m))
        .cast(ArrayType(ByteType)).as("qv")))
  }

  /** Persists as plain parquet: `path/corpus` = (nid, qv int8 levels
    * — 1 byte/dim on disk), `path/meta` = the scale scalar.
    */
  def save(idx: Index, path: String): Unit = {
    val spark = idx.quantized.sparkSession
    import spark.implicits._
    idx.quantized.write.mode("overwrite").parquet(s"$path/corpus")
    Seq(Tuple1(idx.maxAbs)).toDF("max_abs")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(spark.read.parquet(s"$path/meta").head().getDouble(0),
      spark.read.parquet(s"$path/corpus"))

  /** Amortized search: quantize the queries under the INDEX's scale
    * and rank the persisted levels — no corpus fit, no float vectors
    * read. Output (qid, nid, qcos), self-matches excluded, ties by
    * nid; rank<=k plans as WindowGroupLimit per query.
    */
  def searchTopK(queries: DataFrame, idx: Index, k: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
    val q = queries.select(col(idCol).as("qid"),
      quantize(col(vecCol), lit(idx.maxAbs)).as("__graft_qqv"))
    val c = idx.quantized.select(col("nid"),
      col("qv").cast(ArrayType(DoubleType)).as("__graft_cqv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("nid").asc)
    c.crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid") &&
        dot(col("__graft_cqv"), col("__graft_cqv")) > 0 &&
        dot(col("__graft_qqv"), col("__graft_qqv")) > 0)
      .select(col("qid"), col("nid"),
        (dot(col("__graft_cqv"), col("__graft_qqv")) /
          (sqrt(dot(col("__graft_cqv"), col("__graft_cqv"))) *
            sqrt(dot(col("__graft_qqv"), col("__graft_qqv"))))).as("qcos"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Top-k neighbours of `queryId` by quantized cosine, self
    * excluded, zero-norm vectors dropped, ties broken by id.
    * Output: (idCol, qcos).
    */
  def topKByQuantizedCosine(df: DataFrame, idCol: String, vecCol: String,
                            queryId: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scale = fitMaxAbs(df, vecCol)
    val q = df.where(col(idCol) === queryId)
      .crossJoin(broadcast(scale))
      .select(quantize(col(vecCol), col("m")).as("__graft_qv"))
    val corpus = df.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(scale))
      .select(col(idCol), quantize(col(vecCol), col("m")).as("__graft_cv"))

    def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
    corpus.crossJoin(broadcast(q))
      .where(dot(col("__graft_cv"), col("__graft_cv")) > 0 &&
        dot(col("__graft_qv"), col("__graft_qv")) > 0)
      .select(col(idCol),
        (dot(col("__graft_cv"), col("__graft_qv")) /
          (sqrt(dot(col("__graft_cv"), col("__graft_cv"))) *
            sqrt(dot(col("__graft_qv"), col("__graft_qv"))))).as("qcos"))
      .orderBy(col("qcos").desc, col(idCol).asc)
      .limit(k)
  }
}
