package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions across join strategies and the
  * declared queries — the "is this the plan you'd want at 100 TB"
  * checks (SURVEY §4.2).
  */
class PlanShapeSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("small dimension join is broadcast (no shuffle of the big side)") {
    val plan = SparkEntry.queries("q_join_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("same join degrades to SortMergeJoin when broadcast is disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE may still convert to broadcast at runtime from stats; check
      // the *initial* static plan picks SortMergeJoin when hints absent
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders")
      val plan = o.join(c, o("o_custkey") === c("c_custkey"))
        .queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("grouped top-N window query plans WindowGroupLimit (partial group limits)") {
    val plan = SparkEntry.queries("grouped_topn_orders")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("q1_agg has partial aggregation before the exchange") {
    val plan = SparkEntry.queries("q1_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"plan:\n$plan")
    assert(plan.indexOf("HashAggregate") != plan.lastIndexOf("HashAggregate"),
      s"expected partial+final HashAggregate:\n$plan")
  }

  test("semi/anti joins plan as semi/anti (no row multiplication)") {
    val semi = SparkEntry.queries("q_semi_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(semi.contains("LeftSemi"), s"plan:\n$semi")
    val anti = SparkEntry.queries("q_anti_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(anti.contains("LeftAnti"), s"plan:\n$anti")
  }

  test("topn queries scan only the projected columns") {
    val plan = SparkEntry.queries("topn_price_double")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_returnflag:string>"),
      s"plan:\n$plan")
  }

  test("global rank-filter window already rewrites to TakeOrderedAndProject below the Window " +
    "(SURVEY §4.3: no custom optimizer rule needed — verified, not assumed)") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, dir, "lineitem")
    val w = Window.orderBy(col("l_extendedprice").desc)
    val plan = li.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).drop("rn")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("as-of join plans exactly one exchange (the window shuffle)") {
    val plan = SparkEntry.queries("q_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most one shuffle (+AQE wrapper):\n$plan")
    assert(!plan.contains("NestedLoop"), s"plan:\n$plan")
  }
}
