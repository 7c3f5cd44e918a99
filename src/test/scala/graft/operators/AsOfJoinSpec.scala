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

  test("firstAfter: strictly-later match, equal-ts excluded, no-match null") {
    val purchases = Seq(
      (100L, 1L, 50L),  // next click after t=50 is 202 (t=60)
      (101L, 1L, 70L),  // after the last click -> null
      (102L, 2L, 30L),  // click at exactly 30 must NOT match (strict after)
      (103L, 3L, 99L)   // no clicks at all
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (200L, 1L, 20L), (201L, 1L, 40L), (202L, 1L, 60L),
      (203L, 2L, 30L)
    ).toDF("event_id", "user_id", "ts")

    val out = AsOfJoin.firstAfter(purchases, clicks,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCol = "event_id", outCol = "next_click")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_click")).map(_.toLong))
      .toMap

    assert(out == Map(
      100L -> Some(202L),
      101L -> None,
      102L -> None,
      103L -> None))
  }

  test("firstAfter: equal-ts right rows — greatest value wins, same as lastPrior") {
    val left = Seq((1L, 7L, 10L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 7L, 50L), (11L, 7L, 50L)).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.firstAfter(left, right, Seq("user_id"), "ts", "ts",
      "event_id", "next").collect().head
    assert(out.getAs[Long]("next") == 11L)
  }

  test("nearest: closest wins, exact-time matches, distance tie -> backward") {
    val purchases = Seq(
      (100L, 1L, 50L),  // clicks at 40 and 70 -> 40 is closer (d=10 vs 20)
      (101L, 1L, 60L),  // clicks at 40 (d=20) and 70 (d=10) -> 70
      (102L, 2L, 30L),  // click at exactly 30 matches at distance 0
      (103L, 3L, 50L),  // clicks at 40 and 60, both d=10 -> backward (40) wins
      (104L, 4L, 99L)   // no clicks at all -> null
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (200L, 1L, 40L), (201L, 1L, 70L),
      (202L, 2L, 30L),
      (203L, 3L, 40L), (204L, 3L, 60L)
    ).toDF("event_id", "user_id", "ts")

    val out = AsOfJoin.nearest(purchases, clicks,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCol = "event_id", outCol = "near_click")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("near_click")).map(_.toLong))
      .toMap

    assert(out == Map(
      100L -> Some(200L),
      101L -> Some(201L),
      102L -> Some(202L),
      103L -> Some(203L),
      104L -> None))
  }

  test("nearest: tolerance excludes far matches on BOTH sides") {
    val left = Seq((1L, 7L, 100L), (2L, 7L, 500L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 7L, 90L), (11L, 7L, 130L)).toDF("event_id", "user_id", "ts")
    // tol=15: left@100 takes 90 (d=10; 130 is d=30); left@500 has nothing in range
    val out = AsOfJoin.nearest(left, right, Seq("user_id"), "ts", "ts",
        "event_id", "near", toleranceMicros = Some(15L))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("near")).map(_.toLong))
      .toMap
    assert(out == Map(1L -> Some(10L), 2L -> None))
  }

  test("nearest/firstAfter plans: one hash exchange, no nested-loop join") {
    val left = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 7L, 50L)).toDF("event_id", "user_id", "ts")
    for (df <- Seq(
        AsOfJoin.firstAfter(left, right, Seq("user_id"), "ts", "ts", "event_id", "o"),
        AsOfJoin.nearest(left, right, Seq("user_id"), "ts", "ts", "event_id", "o"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"plan:\n$plan")
      assert(plan.contains("Window"), s"plan:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    }
  }
}
