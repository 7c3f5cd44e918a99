package org.apache.spark.sql.graft

import graft.expressions.TextHashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft's native Catalyst expressions.
  *
  * This file lives under `org.apache.spark.sql` because the types an
  * expression implementation needs (`AbstractDataType` for
  * `ExpectsInputTypes`, `classic.ExpressionUtils` for the
  * Expression <-> Column bridge) are `private[sql]` — the standard
  * placement for Spark extension libraries. Everything here is
  * re-exported through the public facade objects in
  * `graft.expressions`; nothing else in graft imports this package
  * directly.
  *
  * Motivation (measured at sf0.1): Spark's higher-order functions
  * (`aggregate`/`zip_with`/`transform`) evaluate their lambdas
  * interpretively per element, which made HOF-composed vector dot
  * products and per-shingle string pipelines the dominant cost of the
  * ANN and MinHash queries. Each expression below runs its whole
  * input in one JVM method and participates in whole-stage codegen.
  */

/** Dot product of two numeric arrays (float/double elements,
  * independently per side), accumulated in double, left-to-right —
  * bit-identical to the HOF fold it replaces.
  */
case class VectorDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = VectorDotExpr.checkedLength(aa.numElements(), bb.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rf) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = org.apache.spark.sql.graft.VectorDotExpr.checkedLength(
          $a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (double)$a.$aGet($i) * (double)$b.$bGet($i);
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotExpr =
    copy(left = newLeft, right = newRight)
}

object VectorDotExpr {
  /** Length-mismatched vectors are a data bug — fail loudly rather
    * than silently truncating (called from generated code too).
    */
  def checkedLength(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"vector_dot: mismatched vector lengths $a vs $b")
    a
  }
}

/** Nearest-centroid assignment: cell id of argmax_c (x·centroid_c −
  * |centroid_c|²/2) over a PLAN-CONSTANT codebook, ties to the LARGEST
  * id — exactly the `array_max(array(struct(score, cell)…))` fold it
  * replaces (lexicographic max of (score, id)), with the same
  * left-to-right double dot product and the same `Σd²/2` half-norm
  * fold, so winners are bit-identical.
  *
  * Why an expression and not literal unrolling: a k-means assignment
  * inlined as k×dim literals builds a 1000+-node Catalyst tree PER
  * ITERATION of a Lloyd fit (fresh literals each round → no plan or
  * codegen cache hit), and the generated projection method blows past
  * the JIT's huge-method limit — whether it runs compiled or
  * interpreted became a per-run coin flip, measured as the chronic
  * 5-25× wall/cpu variance of the quantized-ANN trainers (same task
  * COUNT, inflated driver time — see BASELINE.md round-11). Here the
  * codebook rides along as a reference object and the generated code
  * is a 10-line loop: milliseconds to plan, JIT-compilable, and
  * independent of k×dim.
  */
case class CentroidArgmaxExpr(child: Expression,
                              centroids: Array[Array[Double]],
                              ids: Array[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty && centroids.length == ids.length,
    s"argmax over ${centroids.length} centroids with ${ids.length} ids")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmax"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Σd²/2 per centroid, same fold as the literal form's
    * `c.map(d => d*d).sum / 2.0`.
    */
  private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(d => d * d).sum / 2.0)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val lf = elemIsFloat
    CentroidArgmaxExpr.assign(x, lf, centroids, halfNorms, ids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val halves = ctx.addReferenceObj("halfNorms", halfNorms, "double[]")
    val idArr = ctx.addReferenceObj("ids", ids, "int[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val cent = ctx.freshName("cent")
      s"""
        double $best = Double.NEGATIVE_INFINITY;
        int $bestId = Integer.MIN_VALUE;
        for (int $c = 0; $c < $cents.length; $c++) {
          double[] $cent = $cents[$c];
          int __n = org.apache.spark.sql.graft.VectorDotExpr.checkedLength(
            $a.numElements(), $cent.length);
          double $acc = 0.0;
          for (int $i = 0; $i < __n; $i++) {
            $acc += (double)$a.$get($i) * $cent[$i];
          }
          double $score = $acc - $halves[$c];
          if ($score > $best || ($score == $best && $idArr[$c] > $bestId)) {
            $best = $score; $bestId = $idArr[$c];
          }
        }
        ${ev.value} = $bestId;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmaxExpr =
    copy(child = newChild)
}

object CentroidArgmaxExpr {
  /** Interpreted path, shared so eval and tests agree with codegen. */
  def assign(x: ArrayData, elemIsFloat: Boolean,
             centroids: Array[Array[Double]], halfNorms: Array[Double],
             ids: Array[Int]): Int = {
    var best = Double.NegativeInfinity
    var bestId = Int.MinValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = VectorDotExpr.checkedLength(x.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xv * cent(i)
        i += 1
      }
      val score = acc - halfNorms(c)
      if (score > best || (score == best && ids(c) > bestId)) {
        best = score
        bestId = ids(c)
      }
      c += 1
    }
    bestId
  }
}

/** array<bigint> of word n-gram shingle hashes in [0, 2^31-1) —
  * single-pass kernel, see [[graft.expressions.TextHashing]].
  */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"
  override def nullSafeEval(s: Any): Any =
    TextHashing.shingleHashes(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashing.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}

/** array<bigint> full MinHash signature (k running mins over shingle
  * hashes) computed in one pass per row — replaces an explode +
  * k-way-min groupBy, eliminating that shuffle entirely.
  */
case class MinHashSignatureExpr(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && k >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(s: Any): Any =
    TextHashing.minhashSignature(s.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashing.minhashSignature($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** bigint polynomial rolling fingerprint, (acc*31 + codepoint) mod
  * 1e9+7 — same arithmetic as the SQL-expressible fold.
  */
case class TextFingerprintExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "text_fingerprint"
  override def nullSafeEval(s: Any): Any =
    TextHashing.fingerprint(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashing.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): TextFingerprintExpr =
    copy(child = newChild)
}

/** bigint 64-bit SimHash over single-space tokens. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(s: Any): Any =
    TextHashing.simhash64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashing.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Whole-token occurrence count of `term` in a single-space-tokenized
  * string — the BM25 term-frequency kernel, one pass, zero allocation
  * (vs `size(filter(split(...)))`, whose lambda evaluates
  * interpretively per element and materializes the token array).
  */
case class TokenCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"
  override def nullSafeEval(s: Any, t: Any): Any =
    TextHashing.tokenCount(s.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, t) => s"graft.expressions.TextHashing.tokenCount($s, $t)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Morton (z-order) interleave of two int columns, treated as
  * unsigned 32-bit: bit i of x -> output bit 2i, bit i of y -> 2i+1.
  * The multidimensional clustering key for data layout — sorting by
  * it gives parquet row groups bounded rectangles in (x, y) space, so
  * min/max column statistics prune 2-D range predicates.
  */
case class InterleaveBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override def nullSafeEval(x: Any, y: Any): Any =
    graft.expressions.BitKernels.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.BitKernels.interleave($x, $y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBitsExpr =
    copy(left = newLeft, right = newRight)
}

/** Hilbert-curve index of two int columns (order-31 curve, same
  * guarded non-negative domain as the Morton interleave). Sorting by
  * it clusters 2-D data with strictly better locality than Morton:
  * consecutive indexes are always-adjacent cells, so equal index
  * ranges — and therefore the files a clustered write produces —
  * cover tighter (x, y) bounding boxes for the same file count.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override def nullSafeEval(x: Any, y: Any): Any =
    graft.expressions.BitKernels.hilbert(x.asInstanceOf[Int], y.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.BitKernels.hilbert($x, $y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

/** 3-D Hilbert index (Skilling transform) of three int bucket ids on
  * the order-`bits` curve — [[HilbertIndexExpr]]'s n-dimensional
  * sibling for curve-clustered data layout beyond two columns.
  * Coordinates must fit in `bits` bits (the kernel masks; layout
  * callers range-normalize so they fit by construction).
  */
case class Hilbert3Expr(first: Expression, second: Expression,
                        third: Expression, bits: Int)
    extends TernaryExpression with ExpectsInputTypes {
  require(bits >= 1 && 3 * bits <= 63,
    s"hilbert3: 3 x $bits bits exceeds the 63-bit key")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert3"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    graft.expressions.BitKernels.hilbert3(a.asInstanceOf[Int],
      b.asInstanceOf[Int], c.asInstanceOf[Int], bits)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.expressions.BitKernels.hilbert3($a, $b, $c, $bits)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Hilbert3Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** 4-D Hilbert index — see [[Hilbert3Expr]]. */
case class Hilbert4Expr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression, bits: Int)
    extends QuaternaryExpression with ExpectsInputTypes {
  require(bits >= 1 && 4 * bits <= 63,
    s"hilbert4: 4 x $bits bits exceeds the 63-bit key")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert4"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    graft.expressions.BitKernels.hilbert4(a.asInstanceOf[Int],
      b.asInstanceOf[Int], c.asInstanceOf[Int], d.asInstanceOf[Int], bits)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.expressions.BitKernels.hilbert4($a, $b, $c, $d, $bits)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Hilbert4Expr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Strided byte-subsample of a binary payload: every `stride`-th byte
  * starting at offset 0 — the integer-factor raster/waveform downscale
  * shape on an opaque media column (a real codec would replace the
  * kernel, not the plan).
  */
case class ByteStrideExpr(child: Expression, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_stride"
  override def nullSafeEval(b: Any): Any =
    graft.expressions.MediaKernels.byteStride(b.asInstanceOf[Array[Byte]], stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MediaKernels.byteStride($c, $stride)")
  override protected def withNewChildInternal(newChild: Expression): ByteStrideExpr =
    copy(child = newChild)
}

/** bigint 64-bit difference hash (perceptual dHash) of a binary
  * payload — 65 positional cells, bit c set when cell c's mean byte
  * value exceeds cell c+1's by exact integer cross-multiplication.
  */
case class DiffHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "diff_hash64"
  override def nullSafeEval(b: Any): Any =
    graft.expressions.MediaKernels.diffHash64(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MediaKernels.diffHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): DiffHash64Expr =
    copy(child = newChild)
}

/** Registers graft's expressions as session-scoped SQL functions, so
  * `spark.sql("SELECT simhash64(text) ...")` works — the engine's
  * SQL-facing function surface. Idempotent.
  *
  * Two registration paths: [[register]] for an existing session, and
  * [[injectInto]] for `SparkSessionExtensions` (wired by
  * `graft.GraftSparkExtensions`, usable via the
  * `spark.sql.extensions` conf) — the latter makes the functions part
  * of every session built from the extended builder, including
  * `newSession()` forks.
  */
object GraftFunctionRegistry {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (es => VectorDotExpr(es(0), es(1))),
    "word_shingle_hashes" -> (es =>
      WordShingleHashesExpr(es(0), intArg(es(1), "word_shingle_hashes", 2))),
    "minhash_signature" -> (es => MinHashSignatureExpr(es(0),
      intArg(es(1), "minhash_signature", 2),
      intArg(es(2), "minhash_signature", 3),
      longArg(es(3), "minhash_signature", 4))),
    "text_fingerprint" -> (es => TextFingerprintExpr(es(0))),
    "simhash64" -> (es => SimHash64Expr(es(0))),
    "byte_stride" -> (es => ByteStrideExpr(es(0), intArg(es(1), "byte_stride", 2))),
    "diff_hash64" -> (es => DiffHash64Expr(es(0))),
    "token_count" -> (es => TokenCountExpr(es(0), es(1))),
    "interleave_bits" -> (es => InterleaveBitsExpr(es(0), es(1))),
    "hilbert_index" -> (es => HilbertIndexExpr(es(0), es(1))),
    "hilbert3" -> (es => Hilbert3Expr(es(0), es(1), es(2),
      intArg(es(3), "hilbert3", 4))),
    "hilbert4" -> (es => Hilbert4Expr(es(0), es(1), es(2), es(3),
      intArg(es(4), "hilbert4", 5))),
    "topn_agg" -> (es =>
      TopNAggExpr(es(0), es(1), intArg(es(2), "topn_agg", 3)).toAggregateExpression())
  )

  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("org.apache.spark.sql.graft.GraftExpressions", name),
        b))
    }
    e.injectOptimizerRule(_ => LevenshteinPrefilter)
  }
  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }
  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}

/** Column builders — the only access point for the rest of graft. */
object GraftExpressions {
  def vectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDotExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def wordShingleHashes(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleHashesExpr(ExpressionUtils.expression(c), n))
  def minhashSignature(c: Column, n: Int, k: Int, seed: Long): Column =
    ExpressionUtils.column(MinHashSignatureExpr(ExpressionUtils.expression(c), n, k, seed))
  def textFingerprint(c: Column): Column =
    ExpressionUtils.column(TextFingerprintExpr(ExpressionUtils.expression(c)))
  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(c)))
  def byteStride(c: Column, stride: Int): Column =
    ExpressionUtils.column(ByteStrideExpr(ExpressionUtils.expression(c), stride))
  def diffHash64(c: Column): Column =
    ExpressionUtils.column(DiffHash64Expr(ExpressionUtils.expression(c)))
  def tokenCount(text: Column, term: Column): Column =
    ExpressionUtils.column(TokenCountExpr(
      ExpressionUtils.expression(text), ExpressionUtils.expression(term)))
  def interleaveBits(x: Column, y: Column): Column =
    ExpressionUtils.column(InterleaveBitsExpr(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
  def hilbertIndex(x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertIndexExpr(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
  def hilbert3(x: Column, y: Column, z: Column, bits: Int): Column =
    ExpressionUtils.column(Hilbert3Expr(ExpressionUtils.expression(x),
      ExpressionUtils.expression(y), ExpressionUtils.expression(z), bits))
  def hilbert4(x: Column, y: Column, z: Column, w: Column,
               bits: Int): Column =
    ExpressionUtils.column(Hilbert4Expr(ExpressionUtils.expression(x),
      ExpressionUtils.expression(y), ExpressionUtils.expression(z),
      ExpressionUtils.expression(w), bits))
  def centroidArgmax(x: Column, centroids: Array[Array[Double]],
                     ids: Array[Int]): Column =
    ExpressionUtils.column(CentroidArgmaxExpr(
      ExpressionUtils.expression(x), centroids, ids))
}
