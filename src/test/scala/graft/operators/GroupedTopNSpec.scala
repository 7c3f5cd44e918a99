package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Grouped top-N (SURVEY O8): per-group semantics, row-preserving
  * schema, degenerate no-key delegation, and the WindowGroupLimit
  * physical optimization that keeps the operator scalable.
  */
class GroupedTopNSpec extends SparkSuite {

  private lazy val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")

  test("top-2 orders per customer matches per-group oracle") {
    val out = GroupedTopN.transform(
      TopNConfig("o_totalprice", 2), Seq("o_custkey"), Seq("o_orderkey"))(orders)
    val got = out.collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"))).toSet
    val want = orders.collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice")))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (ck, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(2).map(r => (ck, r._2)).toSeq
      }.toSet
    assert(got == want)
  }

  test("output schema identical to input — rank column dropped (TopN.java:71 parity)") {
    val out = GroupedTopN.transform(TopNConfig("o_totalprice", 2), Seq("o_custkey"))(orders)
    assert(out.schema == orders.schema)
  }

  test("group sizes never exceed N") {
    val out = GroupedTopN.transform(TopNConfig("o_totalprice", 3), Seq("o_custkey"))(orders)
    val biggest = out.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(biggest <= 3)
  }

  test("no keys delegates to global TopN (reference's constant-key degenerate case)") {
    val out = GroupedTopN.transform(TopNConfig("o_totalprice", 5), Nil)(orders)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(out.count() == 5)
  }

  test("physical plan uses WindowGroupLimit (partial per-partition group limit)") {
    val out = GroupedTopN.transform(TopNConfig("o_totalprice", 2), Seq("o_custkey"))(orders)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }
}
