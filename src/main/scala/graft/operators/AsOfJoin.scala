package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Forward as-of join: for each left row, attach the value carried by
    * the *earliest strictly-later* right row with the same key — the
    * `direction="forward"` counterpart of [[lastPrior]] (pandas
    * `merge_asof` exposes the same trio backward/forward/nearest).
    *
    * Same one-shuffle union+window shape as [[lastPrior]]: no
    * |left|x|right| range pairs are ever materialized. Tie semantics:
    * right rows at exactly the left row's time do NOT match (strict
    * "after"); among right rows with equal times the one with the
    * greatest `valueCol` wins (deterministic, matching [[lastPrior]]).
    */
  def firstAfter(
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

    // side=1 (right) sorts BEFORE side=0 (left) at equal times, so a
    // right row at the exact left time is NOT in the following frame —
    // strict "after" semantics. Among equal-time rights, v DESC makes
    // first() return the greatest value (same winner as lastPrior).
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__graft_t").asc, col("__graft_side").desc,
        col("__graft_vs.v").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    leftU.unionByName(rightU)
      .withColumn("__graft_next", first(col("__graft_vs"), ignoreNulls = true).over(w))
      .where(col("__graft_side") === 0)
      .select(col("__graft_row.*"), col("__graft_next.v").as(outCol))
  }

  /** Nearest as-of join: for each left row, attach the value of the
    * right row with the same key whose time is CLOSEST in absolute
    * distance, optionally within `toleranceMicros` — pandas
    * `merge_asof(direction="nearest", tolerance=...)`.
    *
    * Exact-time right rows match (distance 0). Ties: equal distance on
    * both sides → the earlier (backward) row wins; equal times within a
    * side → greatest `valueCol` wins. Time columns may be TimestampType
    * or integral micros-since-epoch (the [[graft.Tables]] fixture
    * contract); distances are computed in microseconds either way.
    *
    * Cost: ONE shuffle on the key; the backward and forward passes are
    * two window sorts over the same exchange, and the tolerance filter
    * is applied to the per-side winner (any other candidate on that
    * side is strictly farther, so filtering after the window is exact).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCol: String,
      outCol: String,
      toleranceMicros: Option[Long] = None
  ): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val keyCols = keys.map(col)
    val vsType = StructType(Seq(
      StructField("v", valueType),
      StructField("rt", right.schema(rightTime).dataType)))

    val leftU = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__graft_t"),
        lit(0).as("__graft_side"),
        lit(null).cast(vsType).as("__graft_vs"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__graft_row")
      ): _*)
    val rightU = right.select(
      keyCols ++ Seq(
        col(rightTime).as("__graft_t"),
        lit(1).as("__graft_side"),
        struct(col(valueCol).as("v"), col(rightTime).as("rt")).as("__graft_vs"),
        lit(null).cast(leftU.schema("__graft_row").dataType).as("__graft_row")
      ): _*)

    // INCLUSIVE frames on both sides (unlike the strict lastPrior /
    // firstAfter): a right row at the exact left time lands in BOTH
    // frames at distance 0 and the backward-wins tie rule picks it.
    val wBack = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__graft_t").asc, col("__graft_side").desc,
        col("__graft_vs.v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__graft_t").asc, col("__graft_side").asc,
        col("__graft_vs.v").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case TimestampType          => unix_micros(c)
        case LongType | IntegerType => c.cast(LongType)
        case other => throw new IllegalArgumentException(
          s"nearest: time column must be TIMESTAMP or integral micros, got $other")
      }
    val lt = micros(col("__graft_t"), left.schema(leftTime).dataType)
    def dist(vs: Column): Column =
      abs(micros(vs.getField("rt"), right.schema(rightTime).dataType) - lt)
    def inTol(vs: Column): Column = toleranceMicros match {
      case Some(tol) => when(dist(vs) <= tol, vs)
      case None      => vs
    }

    val back = inTol(last(col("__graft_vs"), ignoreNulls = true).over(wBack))
    val fwd = inTol(first(col("__graft_vs"), ignoreNulls = true).over(wFwd))

    leftU.unionByName(rightU)
      .withColumn("__graft_b", back)
      .withColumn("__graft_f", fwd)
      .where(col("__graft_side") === 0)
      .withColumn("__graft_pick",
        when(col("__graft_b").isNotNull &&
          (col("__graft_f").isNull ||
            dist(col("__graft_b")) <= dist(col("__graft_f"))),
          col("__graft_b")).otherwise(col("__graft_f")))
      .select(col("__graft_row.*"), col("__graft_pick.v").as(outCol))
  }
}
