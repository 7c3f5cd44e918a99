package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge-case hardening across operators: empty inputs, NULL group
  * keys, degenerate parameters, and partition-count invariance.
  */
class EdgeCasesSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join with empty right side keeps all left rows with NULL prior") {
    val left = Seq((1L, 7L, 9L), (2L, 8L, 5L)).toDF("event_id", "user_id", "ts")
    val right = left.where(lit(false))
    val out = AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts", "ts",
      "event_id", "prior").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("prior"))))
  }

  test("as-of join with empty left side returns empty") {
    val right = Seq((1L, 7L, 9L)).toDF("event_id", "user_id", "ts")
    val left = right.where(lit(false))
    assert(AsOfJoin.lastPrior(left, right, Seq("user_id"), "ts", "ts",
      "event_id", "prior").count() == 0)
  }

  test("grouped top-N with NULL group keys: NULL is its own group") {
    val df = Seq(
      (Option("a"), 1L, 10.0), (Option("a"), 2L, 20.0),
      (Option.empty[String], 3L, 5.0), (Option.empty[String], 4L, 7.0),
      (Option.empty[String], 5L, 6.0)
    ).toDF("g", "id", "v")
    val out = GroupedTopN.transform(TopNConfig("v", 2), Seq("g"), Seq("id"))(df)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(out == Set((Some("a"), 1L), (Some("a"), 2L), (None, 4L), (None, 5L)))
  }

  test("minhash on a corpus where every doc is too short yields no candidates") {
    val df = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    assert(MinHashLSH.candidatePairs(df, "doc_id", "text").count() == 0)
    assert(MinHashLSH.nearDuplicates(df, "doc_id", "text", 0.0).count() == 0)
  }

  test("exact dedup on an empty table returns empty, no error") {
    val df = Seq((1L, "x")).toDF("doc_id", "text").where(lit(false))
    assert(ExactDedup.representatives(df, "doc_id", "text").count() == 0)
  }

  test("top-N result is invariant to input partitioning") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    def run(df: org.apache.spark.sql.DataFrame) =
      TopN.transformDeterministic(TopNConfig("l_extendedprice", 25),
          Seq("l_orderkey", "l_linenumber"))(df)
        .collect().map(_.toSeq).toSeq
    assert(run(li.repartition(1)) == run(li.repartition(17)))
  }

  test("minhash signatures are invariant to input partitioning") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    def sig(df: org.apache.spark.sql.DataFrame) =
      MinHashLSH.signatures(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(sig(docs.repartition(1)) == sig(docs.repartition(13)))
  }

  test("clustering with no edges labels every node as itself") {
    val nodes = (1L to 5L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = NearDupClusters.representatives(nodes, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1L to 5L).map(i => (i, i)).toSet)
  }

  test("new guard parameters reject out-of-range values eagerly") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val p = RandomHyperplaneLSH.Params()
    intercept[IllegalArgumentException] {
      RandomHyperplaneLSH.probeBuckets(emb, "vec_id", "embedding", p,
        extraProbes = p.planesPerTable + 1)
    }
    intercept[IllegalArgumentException] {
      RandomHyperplaneLSH.probeBuckets(emb, "vec_id", "embedding", p, extraProbes = -1)
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      graft.streaming.StreamingOps.statefulTopKWithTTL(
        Seq(("k", 1.0)).toDS(), 2, ttlMillis = 0L)
    }
  }

  test("round-7 operators reject degenerate inputs eagerly and loudly") {
    import spark.implicits._
    // empty graph: no silent empty result — the caller's edge
    // derivation is broken and must hear about it
    intercept[IllegalArgumentException] {
      PageRank.ranks(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
    intercept[IllegalArgumentException] {
      PageRank.Params(iterations = 0)
    }
    // CMS hash family is defined on non-negative keys only
    intercept[IllegalArgumentException] {
      CountMin.estimate(
        CountMin.build(Seq(1L).toDF("k"), "k"), Seq(-5L))
    }
    intercept[IllegalArgumentException] { CountMin.Params(width = 1) }
    intercept[IllegalArgumentException] { Bloom.Params(bits = 32) }
    intercept[IllegalArgumentException] { SemDedup.Params(tau = 0.0) }
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrf2(Seq((1L, 1L)).toDF("id", "rank"),
        Seq((1L, 1L)).toDF("id", "rank"), "id", "rank", topK = 0)
    }
  }

  test("round-7 operators: benign empty/singleton inputs flow through") {
    import spark.implicits._
    // empty protected set: a valid bloom that matches nothing
    val noBits = Bloom.bitset(Seq.empty[Long].toDF("fp"), "fp")
    val probed = Bloom.mightContain(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "fp"), "id", "fp", noBits)
    assert(probed.collect().forall(!_.getBoolean(1)))
    // fused lists may be empty on one or both sides
    val empty = Seq.empty[(Long, Long)].toDF("id", "rank")
    assert(HybridRetrieval.rrf2(empty, empty, "id", "rank", topK = 5)
      .count() == 0)
    // a single vector survives semantic dedup trivially
    val one = Seq((7L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val kept = SemDedup.survivors(one,
      p = SemDedup.Params(k = 1, iterations = 1, trainFraction = 1.0, tau = 0.5))
    assert(kept.select("vec_id").as[Long].collect().sameElements(Array(7L)))
  }

  test("ZOrder.layout rejects negative coordinates per row (sign bit wraps Morton order)") {
    import spark.implicits._
    val ok = Seq((3, 5), (1023, 0)).toDF("x", "y")
    assert(ZOrder.layout(ok, col("x"), col("y"), 2).count() == 2)
    val bad = Seq((3, 5), (-1, 7)).toDF("x", "y")
    val e = intercept[Exception] {
      ZOrder.layout(bad, col("x"), col("y"), 2).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-negative")), s"unexpected: $e")
  }

  test("round-8 graph operators: empty / degenerate edge sets return empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Triangles.perNode(empty, "u", "v").count() == 0)
    assert(KCore.core(empty, "u", "v", k = 2, rounds = 2).count() == 0)
    assert(LabelPropagation.communities(empty, "u", "v", rounds = 2).count() == 0)
    // pure self-loops normalize away to an empty graph
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("u", "v")
    assert(Triangles.perNode(loops, "u", "v").count() == 0)
    assert(KCore.core(loops, "u", "v", k = 1, rounds = 1).count() == 0)
  }

  test("round-8 operators reject out-of-range parameters eagerly") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("u", "v")
    intercept[IllegalArgumentException] { KCore.core(e, "u", "v", k = 0, rounds = 1) }
    intercept[IllegalArgumentException] { KCore.core(e, "u", "v", k = 2, rounds = 0) }
    intercept[IllegalArgumentException] {
      LabelPropagation.communities(e, "u", "v", rounds = 0)
    }
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val idx = IncrementalDedup.fitIndex(docs, "doc_id", "text")
    intercept[IllegalArgumentException] {
      IncrementalDedup.filterNew(docs, "doc_id", "text", idx, minAgree = 0)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.filterNew(docs, "doc_id", "text", idx, minAgree = 65)
    }
  }

  test("snapshot diff and quality rules behave on empty inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "s", "v")
    val full = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    // empty -> full is all added; full -> empty all removed
    val added = SnapshotDiff.diff(empty, full, Seq("k")).collect()
    assert(added.length == 1 && added.head.getString(1) == "added")
    val removed = SnapshotDiff.diff(full, empty, Seq("k")).collect()
    assert(removed.length == 1 && removed.head.getString(1) == "removed")
    // quality rules on an empty table: checked=0, violations=0, no NULLs
    val r = DataQuality.suite(Seq(
      DataQuality.predicateRule(empty, "p", col("v") < 0),
      DataQuality.uniqueRule(empty, "u", Seq("k")))).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSet == Set(("p", 0L, 0L), ("u", 0L, 0L)))
  }

  test("incremental dedup against an EMPTY index admits everything") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "i j k l m n o p"))
      .toDF("doc_id", "text")
    val emptyIdx = IncrementalDedup.fitIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    val out = IncrementalDedup.filterNew(docs, "doc_id", "text", emptyIdx, 45)
    assert(out.count() == 2)
  }
}
