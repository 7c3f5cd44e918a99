package graft

import org.apache.spark.sql.functions._

/** Pinned concrete values from the deterministic sf0.001 fixtures
  * (seed=42, TESTDATA.md). These catch silent semantic drift between
  * rounds — a kernel change that still "passes structurally" but
  * computes something different fails here first.
  */
class GoldenValuesSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("top lineitem price at sf0.001 is 104998.18 (orderkey 174, line 1)") {
    val top = SparkEntry.queries("topn_price_double")(spark, dir).head()
    assert(top.getAs[Long]("l_orderkey") == 174L)
    assert(top.getAs[Int]("l_linenumber") == 1)
    assert(top.getAs[Double]("l_extendedprice") == 104998.18)
  }

  test("q1_agg group count and total row count are stable") {
    val rows = SparkEntry.queries("q1_agg")(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatuses
    assert(rows.map(_.getAs[Long]("count_order")).sum == 6000L)
  }

  test("text fingerprint of doc 0 is reproducible") {
    val docs = Tables(spark, dir, "documents").where(col("doc_id") === 0)
    val fp = docs.select(graft.functions.TextFunctions.fingerprint(col("text")))
      .head().getLong(0)
    // recompute locally from the same text — the kernel and the data
    // must both be stable
    val text = docs.select("text").head().getString(0)
    assert(fp == TestFolds.fingerprintRef(text))
    assert(fp == 191689641L, s"corpus or kernel drifted: fp=$fp")
  }

  test("q_sketch_distinct HLL values at sf0.001 are pinned (deterministic sketch)") {
    // The HLL++ register merge is commutative+idempotent, so the
    // estimate is independent of partitioning and merge order — the
    // raw estimates are exactly reproducible, and a kernel/config
    // drift (relativeSD, hash) fails here first. The declared query
    // surfaces (exact, within-5%-bound flag) for the oracle gate;
    // this pin covers the estimator values themselves.
    val est = graft.Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("text"), 0.02).as("approx_docs"),
        countDistinct(col("text")).as("exact_docs"))
      .orderBy("lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("approx_docs"), r.getAs[Long]("exact_docs")))
    assert(est.toSeq == Seq(
      ("de", 72L, 71L), ("en", 197L, 193L), ("es", 80L, 80L),
      ("fr", 83L, 82L), ("zh", 75L, 74L)),
      s"HLL sketch drifted: ${est.toSeq}")
    val rows = SparkEntry.queries("q_sketch_distinct")(spark, dir)
      .orderBy("lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("exact_docs"),
        r.getAs[Boolean]("approx_within_bound")))
    assert(rows.toSeq == Seq(
      ("de", 71L, true), ("en", 193L, true), ("es", 80L, true),
      ("fr", 82L, true), ("zh", 74L, true)),
      s"sketch-distinct surface drifted: ${rows.toSeq}")
  }

  test("q_sketch_union: union of monthly sketches == one direct yearly sketch") {
    // The mergeability LAW behind the rollup pattern: HLL registers
    // are per-slot maxima, so union-of-monthly-sketches has exactly
    // the registers of one sketch over the whole year — estimates
    // must be EQUAL, not merely close. A drift here means the union
    // path lost precision and per-shard sketching is no longer safe.
    val o = graft.Tables(spark, dir, "orders").select(
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      col("o_custkey"))
    val viaUnion = o.groupBy("yr", "mo")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
      .groupBy("yr")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
    val direct = o.groupBy("yr")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))).as("est"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (u, d) = (m(viaUnion), m(direct))
    assert(u == d && u.nonEmpty, s"sketch-union law broken: $u vs $d")
    val rows = SparkEntry.queries("q_sketch_union")(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("approx_within_bound")),
      "yearly HLL estimate outside the 5% pinned bound")
  }

  test("skyline frontier at sf0.001 is pinned (5 non-dominated orders)") {
    val rows = SparkEntry.queries("q_skyline")(spark, dir)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("day"), r.getAs[Long]("cents")))
    assert(rows.toSeq == Seq(
      (652L, 9131L, 14244931L), (123L, 9135L, 21912689L),
      (104L, 9143L, 46579950L), (96L, 9150L, 48732062L),
      (988L, 9165L, 49970505L)), s"frontier drifted: ${rows.toSeq}")
  }

  test("bottom-k sample head at sf0.001 is pinned (hash order is part of the contract)") {
    val rows = SparkEntry.queries("sample_bottomk")(spark, dir)
      .limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((0L, 0L), (179L, 1219L), (358L, 2438L),
      (140L, 6540L), (319L, 7759L)), s"sample head drifted: ${rows.toSeq}")
  }

  test("decayed scores at sf0.001 are pinned (integer-shift weights)") {
    val rows = SparkEntry.queries("q_decayed_counts")(spark, dir)
      .orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("score_int"),
        r.getAs[Double]("decayed")))
    assert(rows.toSeq == Seq(
      ("click", 5511L, 43.0546875), ("error", 4133L, 32.2890625),
      ("purchase", 4337L, 33.8828125), ("signup", 4700L, 36.71875),
      ("view", 5029L, 39.2890625)), s"decayed scores drifted: ${rows.toSeq}")
  }

  test("winnowed fingerprint stats at sf0.001 are pinned for known docs") {
    val rows = SparkEntry.queries("dedup_winnow")(spark, dir)
      .where(col("doc_id").isin(0L, 1L, 5L)).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0 is fully duplicated elsewhere (all 8 prints shared); doc 1
    // is unique; doc 5 shares 14 of 15 prints with its near-duplicate
    assert(rows.toSeq == Seq((0L, 8L, 8L), (1L, 32L, 0L), (5L, 15L, 14L)),
      s"winnow stats drifted: ${rows.toSeq}")
  }

  test("the one FURNITURE spend outlier at sf0.001 is pinned (integer 3-sigma)") {
    val rows = SparkEntry.queries("q_outliers")(spark, dir)
      .orderBy("seg").collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("n_customers"),
        r.getAs[Long]("n_outliers")))
    assert(rows.toSeq == Seq(("AUTOMOBILE", 23L, 0L), ("BUILDING", 34L, 0L),
      ("FURNITURE", 40L, 1L), ("HOUSEHOLD", 23L, 0L), ("MACHINERY", 30L, 0L)),
      s"outlier flags drifted: ${rows.toSeq}")
    val mx = SparkEntry.queries("q_outliers")(spark, dir)
      .where(col("seg") === "FURNITURE").head().getAs[Long]("max_outlier_spend")
    assert(mx == 601712645L, s"outlier spend drifted: $mx")
  }

  test("pagerank hub ranking at sf0.001 is pinned (scaled-integer exactness)") {
    val top = SparkEntry.queries("graph_pagerank")(spark, dir).head()
    // supplier 7 (offset namespace) is the busiest trading hub; the
    // rank is an exact integer in 1e-12 units — ANY arithmetic or
    // iteration-order drift changes it
    assert(top.getAs[Long]("node") == 10000007L)
    assert(top.getAs[Long]("rank") == 72360156072L, s"rank drifted: $top")
  }

  test("count-min estimates at sf0.001 are pinned and collision-free") {
    val rows = SparkEntry.queries("q_cms_freq")(spark, dir)
      .collect().map(r => (r.getAs[Long]("key"),
        r.getAs[Long]("cm_est"), r.getAs[Long]("exact_cnt"))).sortBy(_._1)
    // at 60k rows / 2048-wide sketch every probe is collision-free:
    // estimate == exact, including 0 for the two absent keys
    assert(rows.forall { case (_, est, exact) => est == exact })
    assert(rows.map(_._2).sum == 267L, s"estimates drifted: ${rows.toSeq}")
  }

  test("quality gate pass count at sf0.001 is pinned") {
    val out = SparkEntry.queries("text_quality_gate")(spark, dir).collect()
    assert(out.length == 500)
    assert(out.count(_.getAs[Boolean]("passes")) == 18,
      "gate thresholds or kernels drifted")
  }

  test("semantic dedup survivor count at sf0.001 is pinned") {
    // flat baseline keeps the historical pin; the flagship two-level
    // path differs only at super-cell boundaries
    assert(SparkEntry.queries("dedup_semantic_flat")(spark, dir).count() == 499L)
    assert(SparkEntry.queries("dedup_semantic")(spark, dir).count() == 499L)
  }

  test("minhash near-dup top pair at sf0.001 is stable") {
    val top = SparkEntry.queries("dedup_minhash")(spark, dir).head()
    // the corpus plants near-dups; the strongest pair is stable data
    assert(top.getAs[Double]("jaccard") > 0.9,
      s"expected a >0.9 planted near-dup, got $top")
  }

  test("asof join: purchases with a prior click count is stable") {
    val out = SparkEntry.queries("q_asof_join")(spark, dir)
    val withPrior = out.where(col("prior_click").isNotNull).count()
    val total = out.count()
    assert(total == Tables(spark, dir, "events")
      .where(col("event_type") === "purchase").count())
    assert(withPrior > 0 && withPrior <= total)
  }

  test("triangle counts at sf0.001: top-3 co-purchase hubs are pinned") {
    val rows = SparkEntry.queries("graph_triangles")(spark, dir)
      .limit(3).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("tri"), r.getAs[Long]("deg")))
    assert(rows.toSeq == Seq((85L, 156L, 27L), (105L, 150L, 26L), (155L, 138L, 24L)),
      s"triangle structure drifted: ${rows.toSeq}")
  }

  test("15-core at sf0.001 is empty; communities collapse to one blob") {
    // at this SF the co-purchase graph is below the k=15 cascade
    // threshold (the cascade peels everything) and the support>=2
    // graph is one dense blob — both DETERMINISTIC structural facts
    // of the fixture; nonzero counts at sf0.01/0.1 are oracle-gated
    assert(SparkEntry.queries("graph_kcore")(spark, dir).count() == 0L)
    val comm = SparkEntry.queries("graph_communities")(spark, dir)
      .agg(count(lit(1)), countDistinct(col("community"))).head()
    assert((comm.getLong(0), comm.getLong(1)) == ((200L, 1L)),
      s"community structure drifted: $comm")
  }

  test("perceptual dHash pairs at sf0.001 are pinned (32 pairs, hamming sum 57)") {
    val agg = SparkEntry.queries("mm_phash_pairs")(spark, dir)
      .agg(count(lit(1)), sum(col("hamming"))).head()
    assert((agg.getLong(0), agg.getLong(1)) == ((32L, 57L)),
      s"dHash pairing drifted: $agg")
  }

  test("incremental dedup admission at sf0.001 is pinned (188 survivors)") {
    val agg = SparkEntry.queries("dedup_incremental")(spark, dir)
      .agg(count(lit(1)), sum(col("doc_id"))).head()
    assert((agg.getLong(0), agg.getLong(1)) == ((188L, 47088L)),
      s"admission decision drifted: $agg")
  }

  test("session windows at sf0.001: 946 sessions over 1000 events") {
    val agg = SparkEntry.queries("q_session_window")(spark, dir)
      .agg(count(lit(1)), sum(col("n_events"))).head()
    assert((agg.getLong(0), agg.getLong(1)) == ((946L, 1000L)),
      s"session merge drifted: $agg")
  }

  test("snapshot diff stripes at sf0.001 are pinned (15/14/16)") {
    val byType = SparkEntry.queries("q_snapshot_diff")(spark, dir)
      .groupBy("change").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(byType == Map("added" -> 15L, "changed" -> 14L, "removed" -> 16L),
      s"diff classification drifted: $byType")
  }

  test("data-quality contract at sf0.001 is pinned rule by rule") {
    val rows = SparkEntry.queries("q_data_quality")(spark, dir)
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getAs[Long]("checked"), r.getAs[Long]("violations")))
    assert(rows.toSeq == Seq(
      ("customer_acctbal_negative", 150L, 11L),
      ("documents_nchars_consistent", 500L, 0L),
      ("lineitem_qty_range", 6000L, 0L),
      ("lineitem_qty_review", 6000L, 590L),
      ("orders_custkey_ri", 1500L, 0L),
      ("orders_key_unique", 1500L, 0L)),
      s"quality contract drifted: ${rows.toSeq}")
  }

  test("q_k_anonymity at sf0.001 exercises BOTH branches: 25 generalized " +
      "classes, 8 still risky after one generalization level") {
    // the driver's sf0.01 gate sees only pass-through classes (every
    // class >= k there), so the generalization arithmetic is pinned
    // HERE at the scale where it fires
    val rows = SparkEntry.queries("q_k_anonymity")(spark, dir).collect()
    assert(rows.length == 28)
    val gen = rows.filter(_.getAs[Boolean]("generalized"))
    assert(gen.length == 25) // every nation has at least one sub-k class
    val risky = gen.filter(_.getAs[Boolean]("still_risky"))
      .map(_.getAs[Int]("c_nationkey")).toSet
    assert(risky == Set(0, 6, 7, 8, 10, 12, 22, 23),
      s"still-risky nations drifted: $risky")
    val n7 = gen.find(_.getAs[Int]("c_nationkey") == 7).get
    assert(n7.getAs[Long]("n") == 3L && n7.getAs[String]("segment") == "*")
  }

  test("text_zipf_octaves at sf0.001 is pinned: 31-term vocabulary, " +
      "~halving mass per octave") {
    val rows = SparkEntry.queries("text_zipf_octaves")(spark, dir)
      .orderBy("octave").collect()
      .map(r => (r.getAs[Long]("octave"), r.getAs[Long]("n_terms"),
        r.getAs[Long]("tot_freq")))
    assert(rows.toSeq == Seq((0L, 1L, 984L), (1L, 2L, 1954L),
      (2L, 4L, 3865L), (3L, 8L, 7511L), (4L, 16L, 13625L)),
      s"octave profile drifted: ${rows.toSeq}")
  }

  test("text_lm_surprisal at sf0.001 is pinned, and the en-fitted LM " +
      "scores en docs lowest") {
    val rows = SparkEntry.queries("text_lm_surprisal")(spark, dir).collect()
    assert(rows.length == 500)
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum == 27439L)
    assert(rows.map(_.getAs[Long]("oov_bigrams")).sum == 7L)
    assert(rows.map(_.getAs[Long]("total_bits")).sum == 121328L)
    // the quality-filter signal: the target language's corpus-mean
    // surprisal is strictly the lowest of the five languages
    val byLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      l -> rs.map(_.getAs[Long]("total_bits")).sum.toDouble /
        rs.map(_.getAs[Long]("n_bigrams")).sum
    }
    assert(byLang("en") == byLang.values.min,
      s"en should score lowest under the en LM: $byLang")
  }

  test("sample_lm_contrast at sf0.001 selects the target domain: " +
      "46 of the top-50 are en") {
    val rows = SparkEntry.queries("sample_lm_contrast")(spark, dir).collect()
    assert(rows.length == 50)
    assert(rows.count(_.getAs[String]("lang") == "en") == 46)
    val top = rows.maxBy(r => (r.getAs[Long]("weight_bits"),
      -r.getAs[Long]("doc_id")))
    assert(top.getAs[Long]("doc_id") == 133L &&
      top.getAs[Long]("weight_bits") == 9L)
  }

  test("q_market_basket at sf0.001 is pinned: top pair (51, 159), " +
      "support 4, lift > 11") {
    val rows = SparkEntry.queries("q_market_basket")(spark, dir).collect()
    assert(rows.length == 15)
    val h = rows.head
    assert(h.getAs[Long]("p1") == 51L && h.getAs[Long]("p2") == 159L &&
      h.getAs[Long]("c12") == 4L && h.getAs[Long]("c1") == 21L &&
      h.getAs[Long]("c2") == 25L)
    assert(h.getAs[Double]("lift") > 11.2 && h.getAs[Double]("lift") < 11.3)
  }

  test("q_journey_transitions at sf0.001: 25 cells over 985 " +
      "transitions; rows normalize to 1") {
    val rows = SparkEntry.queries("q_journey_transitions")(spark, dir).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("transitions")).sum == 985L)
    val top = rows.maxBy(r => (r.getAs[Long]("transitions"),
      r.getAs[String]("from_type")))
    assert(top.getAs[String]("from_type") == "error" &&
      top.getAs[String]("to_type") == "click" &&
      top.getAs[Long]("transitions") == 49L)
    val rowSums = rows.groupBy(_.getAs[String]("from_type"))
      .values.map(_.map(_.getAs[Double]("prob")).sum)
    rowSums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("graph_ancestors at sf0.001: 1345 pairs, deepest chain 8") {
    val rows = SparkEntry.queries("graph_ancestors")(spark, dir).collect()
    assert(rows.length == 1345)
    assert(rows.map(_.getAs[Long]("depth")).max == 8L)
    // node 199's chain: 99, 49, 24, 12, 6, 3, 1, 0
    val chain = rows.filter(_.getAs[Long]("node") == 199L)
      .sortBy(_.getAs[Long]("depth")).map(_.getAs[Long]("anc")).toSeq
    assert(chain == Seq(99L, 49L, 24L, 12L, 6L, 3L, 1L, 0L))
  }
}
