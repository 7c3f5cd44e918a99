package graft.operators

import graft.SparkSuite
import graft.expressions.TopNAggregate
import org.apache.spark.sql.functions._

/** The TypedImperativeAggregate form of top-N (SURVEY §4.3 stretch):
  * semantics equal to the window form modulo tie choice, partial
  * (map-side) aggregation in the plan, global usage, null handling.
  */
class TopNAggregateSpec extends SparkSuite {

  private lazy val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")

  test("aggregate form matches window form on tie-free ranking values") {
    val viaAgg = GroupedTopN.transformViaAggregate(
      TopNConfig("o_totalprice", 3), Seq("o_custkey"))(orders)
    val viaWin = GroupedTopN.transform(
      TopNConfig("o_totalprice", 3), Seq("o_custkey"))(orders)
    // compare (group, ranking value) multisets — tie-agnostic contract
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("o_custkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(canon(viaAgg) == canon(viaWin))
  }

  test("output schema identical to input (row-preserving, TopN.java:71)") {
    val out = GroupedTopN.transformViaAggregate(
      TopNConfig("o_totalprice", 2), Seq("o_custkey"))(orders)
    assert(out.schema == orders.schema)
  }

  test("plan uses ObjectHashAggregate with a partial stage (map-side heaps)") {
    val plan = GroupedTopN.transformViaAggregate(
      TopNConfig("o_totalprice", 2), Seq("o_custkey"))(orders)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(plan.contains("partial_topn_agg"), s"plan:\n$plan")
  }

  test("global top-N via aggregate on a constant key") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 50.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
    val top = df.groupBy(lit(true).as("k"))
      .agg(TopNAggregate.topNAgg(col("v"), struct(col("id"), col("v")), 2).as("t"))
      .select(explode(col("t")).as("r")).select("r.*")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == Seq((2L, 50.0), (4L, 40.0))) // descending
  }

  test("nulls rank smallest and survive only when the heap never fills") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)]((1L, 5.0), (2L, null), (3L, 7.0))
      .toDF("id", "v")
    val top2 = df.groupBy(lit(1).as("k"))
      .agg(TopNAggregate.topNAgg(col("v"), col("id"), 2).as("t"))
      .select(explode(col("t")).as("id")).collect().map(_.getLong(0))
    assert(top2.toSeq == Seq(3L, 1L)) // null evicted
    val top3 = df.groupBy(lit(1).as("k"))
      .agg(TopNAggregate.topNAgg(col("v"), col("id"), 3).as("t"))
      .select(explode(col("t")).as("id")).collect().map(_.getLong(0))
    assert(top3.toSeq == Seq(3L, 1L, 2L)) // null kept, last
  }

  test("non-numeric ordering column is rejected at analysis") {
    val e = intercept[Exception] {
      orders.groupBy(col("o_custkey"))
        .agg(TopNAggregate.topNAgg(col("o_orderstatus"), col("o_orderkey"), 2))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("topn_agg") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
