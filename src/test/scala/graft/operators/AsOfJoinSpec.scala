package graft.operators

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("lastPrior: strictly-earlier match, equal-ts excluded, no-match null") {
    val purchases = Seq(
      (100L, 1L, 50L),  // user 1 buys at t=50
      (101L, 1L, 10L),  // user 1 buys at t=10 (before any click)
      (102L, 2L, 30L),  // user 2 buys at t=30; click at exactly 30 must NOT match
      (103L, 3L, 99L)   // user 3 has no clicks at all
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (200L, 1L, 20L), (201L, 1L, 40L), (202L, 1L, 60L), // user 1: last prior of t=50 is 201
      (203L, 2L, 30L)                                     // user 2: equal ts -> excluded
    ).toDF("event_id", "user_id", "ts")

    val out = AsOfJoin.lastPrior(purchases, clicks,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCol = "event_id", outCol = "prior_click")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("prior_click")).map(_.toLong))
      .toMap

    assert(out == Map(
      100L -> Some(201L),
      101L -> None,
      102L -> None,
      103L -> None))
  }

  test("equal-ts right rows: greatest value wins deterministically") {
    val left = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 7L, 50L), (11L, 7L, 50L)).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts", "ts",
      "event_id", "prior").collect().head
    assert(out.getAs[Long]("prior") == 11L)
  }

  test("plan has a single shuffle (window), no nested-loop range join") {
    val left = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 7L, 50L)).toDF("event_id", "user_id", "ts")
    val plan = AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts", "ts",
      "event_id", "prior").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"plan:\n$plan")
    assert(plan.contains("Window"), s"plan:\n$plan")
  }
}
