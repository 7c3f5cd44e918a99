package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, attach the value carried by the
  * *latest strictly-earlier* right row with the same key.
  *
  * Implemented with the union + window trick rather than a range join:
  * both sides are tagged and unioned, partitioned by key, sorted by
  * (time, side, tiebreak), and each left row reads
  * `last(value, ignoreNulls)` over the unbounded-preceding frame. This
  * costs ONE shuffle on the key and never materializes the |left|x|right|
  * range-match pairs — the shape that survives a 100x scale-up, unlike
  * a theta-join (`r.ts < l.ts`) which Spark would plan as a nested-loop
  * join with quadratic row expansion per key.
  *
  * Tie semantics: right rows at exactly the left row's time do NOT
  * match (strict "prior"); among right rows with equal times the one
  * with the greatest `valueCol` wins (deterministic).
  */
object AsOfJoin {

  def lastPrior(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCol: String,
      outCol: String
  ): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val keyCols = keys.map(col)

    // The carried value is wrapped in a single-field struct: the struct
    // is NULL only for left-side rows, so `last(..., ignoreNulls)`
    // correctly returns a right row whose value itself is NULL instead
    // of skipping past it to an older row.
    val leftU = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__graft_t"),
        lit(0).as("__graft_side"),
        lit(null).cast(StructType(Seq(StructField("v", valueType))))
          .as("__graft_vs"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__graft_row")
      ): _*)
    val rightU = right.select(
      keyCols ++ Seq(
        col(rightTime).as("__graft_t"),
        lit(1).as("__graft_side"),
        struct(col(valueCol).as("v")).as("__graft_vs"),
        lit(null).cast(leftU.schema("__graft_row").dataType).as("__graft_row")
      ): _*)

    // side=0 (left) sorts BEFORE side=1 (right) at equal times, so a
    // right row at the exact left time is not in the preceding frame —
    // strict "prior" semantics.
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__graft_t").asc, col("__graft_side").asc,
        col("__graft_vs.v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftU.unionByName(rightU)
      .withColumn("__graft_prior", last(col("__graft_vs"), ignoreNulls = true).over(w))
      .where(col("__graft_side") === 0)
      .select(col("__graft_row.*"), col("__graft_prior.v").as(outCol))
  }
}
