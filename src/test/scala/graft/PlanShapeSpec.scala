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

  test("grouping sets plan: Expand feeds a partial aggregate before the exchange") {
    val qe = SparkEntry.queries("q_grouping_sets")(spark, dir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Expand"), s"plan:\n$plan")
    // partial (map-side) aggregation must sit below the shuffle so each
    // grouping-set replica combines before crossing the wire
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0 && exchange < plan.lastIndexOf("HashAggregate"),
      s"expected partial agg below the exchange:\n$plan")
  }

  test("full outer join plans a join preserving both sides (SMJ/SHJ FullOuter)") {
    val plan = SparkEntry.queries("q_full_outer_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"plan:\n$plan")
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

  test("sample_bottomk plans TakeOrderedAndProject (no corpus sort or shuffle)") {
    val plan = SparkEntry.queries("sample_bottomk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"bottom-k must not globally sort the corpus:\n$plan")
  }

  test("q_group_mode pre-aggregates and plans WindowGroupLimit for rank=1") {
    val plan = SparkEntry.queries("q_group_mode")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
    // the window input is the (user, type) aggregate, not raw events:
    // a partial aggregate must appear below the window's exchange
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"plan:\n$plan")
  }

  test("sample_group_bottomk plans WindowGroupLimit (per-task k rows per group)") {
    val plan = SparkEntry.queries("sample_group_bottomk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("q_outliers broadcasts the per-group stats back over the fact scan") {
    val plan = SparkEntry.queries("q_outliers")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
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

  test("runtime bloom-filter join pruning injects a bloom filter on the big side") {
    // the declared q_runtime_bloom_join query itself (child session
    // with the big-big regime confs) must carry the injected filter
    val plan = SparkEntry.queries("q_runtime_bloom_join")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
      s"expected runtime bloom filter in optimized plan:\n$plan")
    assert(plan.contains("might_contain"),
      s"expected might_contain pushed to the application side:\n$plan")
    // and the isolation contract holds: the parent session's conf is
    // untouched by building the query
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import org.apache.spark.sql.functions.{col, lit}
    // hot key 42 holds ~100k rows; the other side is uniform
    val skewed = s2.range(100000).select(lit(42L).as("k"), col("id").as("v"))
      .unionAll(s2.range(1000).select((col("id") % 37).as("k"), col("id").as("v")))
    val dim = s2.range(64).select(col("id").as("k"), (col("id") * 2).as("w"))
    // aggregate to keep collect() small; execute THIS dataset's own
    // QueryExecution so the adaptive plan is finalized on it
    val joined = skewed.join(dim, Seq("k"))
      .groupBy().count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"expected AQE skew split:\n$plan")
  }

  test("as-of join plans exactly one exchange (the window shuffle)") {
    val plan = SparkEntry.queries("q_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most one shuffle (+AQE wrapper):\n$plan")
    assert(!plan.contains("NestedLoop"), s"plan:\n$plan")
  }

  test("CDC compaction plans WindowGroupLimit (survivors shuffle, not history)") {
    val plan = SparkEntry.queries("q_latest_by_key")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("text chunking and redaction are shuffle-free narrow plans") {
    for (q <- Seq("text_chunks", "text_redact")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q plans a shuffle:\n$plan")
    }
  }

  test("hopping window plans Expand below a partial aggregate") {
    val plan = SparkEntry.queries("q_hop_window")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"plan:\n$plan")
    val exchange = plan.indexOf("Exchange")
    assert(exchange >= 0 && exchange < plan.lastIndexOf("HashAggregate"),
      s"expected partial agg below the exchange:\n$plan")
  }

  test("correlated EXISTS decorrelates to a semi join, never a nested loop") {
    val plan = SparkEntry.queries("q_exists_subquery")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"plan:\n$plan")
    assert(!plan.contains("NestedLoop"), s"plan:\n$plan")
  }

  test("q_profile reads the table once (multi-distinct via one Expand)") {
    val plan = SparkEntry.queries("q_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"plan:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one scan:\n$plan")
  }

  test("fuzzy join is an equi-join on the blocking key, never a nested loop") {
    val plan = SparkEntry.queries("fuzzy_join_parts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"plan:\n$plan")
  }

  test("BM25 top-k: one corpus scan into TakeOrderedAndProject, no hash shuffle") {
    val plan = SparkEntry.queries("text_bm25")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one corpus scan:\n$plan")
    // scoring itself shuffles nothing; the only exchange is the
    // single-partition one ranking the k survivors
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring should not hash-shuffle the corpus:\n$plan")
  }

  test("z-order layout plans one range exchange + in-partition sort") {
    val pts = Tables(spark, dir, "lineitem")
      .select(pmod(col("l_partkey"), lit(1024)).cast("int").as("x"),
        pmod(col("l_suppkey"), lit(1024)).cast("int").as("y"))
    val plan = graft.operators.ZOrder.layout(pts, col("x"), col("y"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"plan:\n$plan")
    assert(plan.contains("Sort [__z"), s"expected in-partition sort:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
  }

  test("q_bucketed_join joins co-located buckets with no join-side exchange") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, dir)
    // executedPlan: EnsureRequirements has inserted exchanges (the
    // pre-preparation sparkPlan shows none anywhere)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
    // the ONLY exchange is the final group-by's: both join inputs are
    // bucketed 8 ways on the join key, so the join itself is
    // shuffle-free — the 100 TB fact-to-fact join shape
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected only the aggregation exchange, got $exchanges:\n$plan")
  }

  test("q_bucket_pruned reads a strict subset of the 8 bucket files") {
    val df = SparkEntry.queries("q_bucket_pruned")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the IN-filter on the bucket key prunes at planning: the scan
    // reports fewer than 8 selected buckets (4 keys -> at most 4)
    val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt <= 4, s"expected <= 4 buckets:\n$plan")
  }

  test("q_partition_pruned scans exactly the 3 matching day partitions") {
    val df = SparkEntry.queries("q_partition_pruned")(spark, dir)
    // collect on the pre-AQE physical plan: the adaptive wrapper hides
    // the scan node from executedPlan.collect before execution
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected one file scan, got ${scans.length}")
    // the day range must reach the scan as PartitionFilters — pruning
    // happens at planning from directory metadata, no data read
    val meta = scans.head.metadata
    assert(meta.get("PartitionFilters").exists(_.contains("day")),
      s"no partition filter on day: $meta")
    assert(scans.head.selectedPartitions.partitionCount == 3,
      s"expected 3 pruned day dirs, scanned ${scans.head.selectedPartitions.partitionCount}")
    // and the values agree with the unpartitioned base table
    val base = Tables(spark, dir, "events")
      .where(to_date(timestamp_micros(col("ts")))
        .between(lit("2024-01-05"), lit("2024-01-07")))
      .count()
    assert(df.agg(sum("n_events")).head().getLong(0) == base)
  }

  test("lake_part_pruned reads exactly ONE partition directory group " +
      "with the status filter in PartitionFilters") {
    val df = SparkEntry.queries("lake_part_pruned")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected one file scan, got ${scans.length}")
    val meta = scans.head.metadata
    // the partition-equality conjunct must reach the scan as a
    // PARTITION filter (directory pruning from log metadata), not a
    // data filter; the key range stays a pushed data filter
    assert(meta.get("PartitionFilters").exists(_.contains("o_orderstatus")),
      s"no partition filter on o_orderstatus: $meta")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      "the 'O' partition alone must survive pruning, got " +
        s"${scans.head.selectedPartitions.partitionCount}")
    assert(meta.get("PushedFilters").exists(_.contains("o_orderkey")),
      s"key range must still push to parquet: $meta")
  }
}
