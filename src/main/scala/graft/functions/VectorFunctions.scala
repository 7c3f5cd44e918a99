package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * The dot product is the custom codegen'd expression
  * [[graft.expressions.VectorDot]] — Spark's higher-order-function
  * composition (`aggregate(zip_with(...))`) evaluates lambdas
  * interpretively per element and measured ~20x slower on 64-dim
  * vectors. Both forms accumulate in double, left-to-right, so results
  * are bit-identical FOR EQUAL-LENGTH inputs; on mismatched lengths
  * [[dot]] throws while the HOF form would null-pad. [[dotHof]] keeps
  * the composable form for cross-checking.
  */
object VectorFunctions {

  def toDoubleArray(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Ordered-fold dot product of two equal-length vectors
    * (codegen'd native expression).
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorDot(a, b)

  /** Reference implementation via higher-order functions — same
    * summation order, used to cross-validate [[dot]] in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL (not NaN) for zero-norm inputs, so
    * degenerate vectors sort last under `desc` ranking instead of
    * first (Spark orders NaN above every real double).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom)
  }
}
