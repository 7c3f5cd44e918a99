package graft.expressions

import org.apache.spark.sql.Column

/** Facade for graft's native aggregate functions. */
object TopNAggregate {

  /** `topNAgg(ord, payload, n)` — array of the payloads of the n
    * largest ord values (descending, nulls smallest, arbitrary ties),
    * as a partial-aggregating Catalyst `TypedImperativeAggregate`.
    * See `org.apache.spark.sql.graft.TopNAggExpr`.
    */
  def topNAgg(ord: Column, payload: Column, n: Int): Column =
    org.apache.spark.sql.graft.TopNAgg(ord, payload, n)
}
