package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle budgets for the headline operator families: each declared
  * query carries the MINIMAL exchange structure its semantics allow,
  * and this spec pins that number so a refactor that silently adds a
  * shuffle (a lost broadcast, a missed partial aggregation, a
  * re-partitioned subtree) fails here before it ships. At 100 TB every
  * exchange is a full materialize-and-redistribute of its input —
  * the budget IS the scale contract.
  *
  * Budgets are counted on the planned (pre-execution) physical plan at
  * the suite's fixed shuffle-partition setting; broadcast exchanges are
  * deliberately NOT counted (a broadcast of a small side is the cheap
  * alternative the budget rewards).
  */
class ShuffleBudgetSpec extends SparkSuite {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      s +: allNodes(s.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def shuffles(name: String): Int =
    allNodes(SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])

  /** query -> (max shuffles, why that number is the floor). */
  private val budgets: Seq[(String, Int, String)] = Seq(
    // scan-only families: pure projection/filter pipelines — zero
    // exchanges, scan-bandwidth-bound at any scale
    ("topn_price_double", 0, "TakeOrderedAndProject: per-task heaps + driver merge"),
    ("text_bm25", 0, "one corpus scan into TakeOrderedAndProject"),
    ("text_chunks", 0, "narrow generator (split/posexplode/slice)"),
    ("text_langid", 0, "per-row marker scoring, no grouping"),
    ("text_stats", 0, "per-row token arithmetic"),
    ("text_fingerprint", 0, "codegen'd rolling hash projection"),
    ("mm_features", 0, "byte-kernel projection over binary payloads"),
    ("sample_weighted_mix", 0, "hash-gate filter, thresholds are literals"),
    ("sample_temperature_mix", 1,
      "thresholds from a checkpointed |langs|-row aggregate broadcast back; " +
        "the corpus is filtered, never redistributed"),
    // one-shuffle families: a single key-partitioned stage is the
    // semantic minimum (group-by, window-per-key, or dedup key)
    ("q1_agg", 1, "partial aggregation map-side, one exchange on group keys"),
    ("q_join_revenue", 1, "dimensions broadcast; the one exchange is the final agg"),
    ("grouped_topn_orders", 1, "WindowGroupLimit partials, one window shuffle"),
    ("grouped_topn_agg", 1, "typed partial heaps, one exchange on group keys"),
    ("q_sessionize", 1, "one user-key shuffle; gap logic is per-partition"),
    ("q_session_window", 1, "UpdatingSessions over one user-key shuffle"),
    ("q_hop_window", 1, "constant 4x Expand BEFORE one window-key exchange"),
    ("q_time_bucket", 1, "partial agg per day bucket, one exchange"),
    ("q_latest_by_key", 1, "rank-1 compaction: survivors shuffle, not history"),
    ("q_scd2_intervals", 1, "lead() per entity key, one shuffle"),
    ("q_decayed_counts", 1, "integer-shift weights fold map-side, one exchange"),
    ("q_histogram", 1, "integer bucketing folds map-side, one exchange"),
    ("dedup_exact", 1, "hash-grouped on content hash, payload never re-shuffled"),
    ("q_asof_join", 1, "union+window form: ONE shuffle replaces a range join"),
    // join families (counted at the suite's SF/config: small sides
    // broadcast, so the budget also guards the broadcast decision)
    ("q_semi_join", 0, "EXISTS side broadcasts; fact side never moves"),
    ("q_anti_join", 0, "NOT-EXISTS side broadcasts; fact side never moves"),
    ("q_outer_join", 1, "one exchange for the preserved-side SMJ + agg"),
    ("q_nullsafe_join", 1, "null-safe equi-join keys shuffle once"),
    ("q_range_join", 1, "bucketed range join: one exchange, no cartesian"),
    ("q_interval_join", 1, "interval overlap via bucket keys, one exchange"),
    ("q_exists_subquery", 1, "decorrelated to a semi join + final agg exchange"),
    ("q_winsorize", 1, "5-row percentile relation broadcasts back; one agg"),
    ("dedup_simhash", 0, "16-bit band join broadcasts at suite SF; no corpus shuffle"),
    ("sample_train_split", 0, "hash-gate filter only"),
    ("text_quality_gate", 0, "per-row quality arithmetic, no grouping"),
    ("mm_decode", 0, "partition-batched byte kernels, pure projection"),
    ("mm_frames", 0, "byte-exact frame sampling, pure projection"),
    ("mm_resize", 0, "integer-factor stride kernel, pure projection"),
    ("text_head_tail_truncate", 0, "slice+concat projection"),
    ("topn_orderkey_long", 0, "TakeOrderedAndProject"),
    ("topn_ignorenull", 0, "IsNotNull pushed to scan + TakeOrderedAndProject"),
    ("ann_brute_topk", 1, "queries broadcast over the corpus; one top-k exchange"),
    ("sample_stratified", 1, "per-language rank window, one exchange"),
    ("q_percentiles", 1, "interpolated percentiles, one group exchange"),
    ("q_approx_percentile_gate", 1,
      "GK sketch + exact brackets fold in one grouped aggregate"),
    ("q_rollup", 1, "rollup Expand feeds partial agg, one exchange"),
    ("q_cube", 1, "cube Expand feeds partial agg, one exchange"),
    ("q_grouping_sets", 1, "grouping-sets Expand feeds partial agg, one exchange"),
    ("q_window_funcs", 1, "one per-customer window shuffle"),
    ("q_window_range_frame", 1, "value-based frame over one key shuffle"),
    ("q_ntile_buckets", 1, "ntile over one priority-key shuffle"),
    ("q_dist_rank", 1, "percent_rank/cume_dist over one key shuffle"),
    ("q_array_agg", 1, "collect_list partial-agg'd map-side, one exchange"),
    ("text_bigrams", 1, "explode then one df-count exchange"),
    ("q_json_extract", 1, "extracted key folds map-side, one exchange"),
    // two-shuffle families: two genuinely different keys or a 2-phase
    // algorithm (distinct/pivot rewrite, pre-agg + window)
    ("q_gap_fill", 2, "(user,day) counts then per-user spans; fill join broadcasts"),
    ("q_journey_paths", 2, "user-key session window, then path-count exchange"),
    ("q_distinct_agg", 2, "distinct rewrite: expand phase + final phase"),
    ("q_pivot", 2, "pivot's two-phase aggregate"),
    ("q_profile", 2, "one 5x Expand scan + two-phase multi-distinct"),
    ("q_group_mode", 2, "(user,type) pre-agg then per-user WindowGroupLimit"),
    ("q_setops", 2, "intersect/except plan as two distinct phases"),
    ("q_scalar_subquery", 2, "correlated avg decorrelates to agg + join + agg"),
    ("q_skyline", 2, "per-x maxima then frontier broadcast back"),
    ("q_sketch_distinct", 2, "HLL partials + the exact-distinct gate's 2-phase"),
    ("text_top_terms", 2, "token df counts then per-language top-k window"),
    ("q_full_outer_join", 2, "both sides preserved: each shuffles once"),
    // three-shuffle: three semantically distinct stages
    ("q_cohort_retention", 3,
      "first-order min per customer, cohort join reuse, distinct-count cell"),
    ("q_skew_report", 3,
      "one checkpointed (key,count) partial agg per key space; raw tables never re-shuffle"),
    // staged frontiers: per-type filter + agg per stage, frontier
    // joins broadcast as they shrink (AQE)
    ("q_funnel", 8, "3 stage aggs + the count union; frontiers shrink"),
    ("q_funnel_windowed", 8,
      "same staged shape; the horizon predicate rides the stage joins"))

  budgets.foreach { case (name, maxShuffles, why) =>
    test(s"$name stays within its shuffle budget ($maxShuffles): $why") {
      val n = shuffles(name)
      assert(n <= maxShuffles,
        s"$name plans $n shuffles, budget $maxShuffles — $why")
    }
  }
}
