package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType)` embedding columns, built
  * entirely from Spark's higher-order functions (`zip_with` /
  * `aggregate`) so everything stays inside codegen'd projections — no
  * UDFs, no serialization boundary, and the expressions survive
  * whole-stage codegen on the scan→project path.
  *
  * All arithmetic is promoted to double *before* folding (ordered
  * left-to-right) so results are deterministic and engine-portable.
  */
object VectorFunctions {

  def toDoubleArray(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Ordered-fold dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
