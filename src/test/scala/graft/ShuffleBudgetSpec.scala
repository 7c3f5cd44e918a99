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
    // two-shuffle families: two genuinely different keys
    ("q_gap_fill", 2, "(user,day) counts then per-user spans; fill join broadcasts"),
    ("q_journey_paths", 2, "user-key session window, then path-count exchange"))

  budgets.foreach { case (name, maxShuffles, why) =>
    test(s"$name stays within its shuffle budget ($maxShuffles): $why") {
      val n = shuffles(name)
      assert(n <= maxShuffles,
        s"$name plans $n shuffles, budget $maxShuffles — $why")
    }
  }
}
