package graft

/** Driver-contract smoke: every declared query must build and run at
  * sf0.001, every query with an oracle must exist in `queries`, and the
  * flagship `entry` must return rows. The exact-value oracle gate runs
  * driver-side (DuckDB at sf0.01); `tools/oracle_check.py` replays it
  * locally.
  */
class SparkEntrySpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("smokeQueries: every name exists, no duplicates, family spread") {
    val missing = SparkEntry.smokeQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"smoke names not in the registry: $missing")
    assert(SparkEntry.smokeQueries.distinct.size ==
      SparkEntry.smokeQueries.size, "duplicate smoke names")
    // the subset stays a cheap certify (~1/4 of the registry) while
    // touching every operator family prefix
    assert(SparkEntry.smokeQueries.size >= 40 &&
      SparkEntry.smokeQueries.size <= SparkEntry.queries.size / 3)
    Seq("q_", "topn_", "grouped_", "dedup_", "ann_", "text_", "mm_",
      "sample_", "graph_", "stream_", "lake_").foreach { fam =>
      assert(SparkEntry.smokeQueries.exists(_.startsWith(fam)),
        s"no smoke representative for family $fam")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
