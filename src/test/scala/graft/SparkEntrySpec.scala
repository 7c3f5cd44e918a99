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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
