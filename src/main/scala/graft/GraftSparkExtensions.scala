package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` hook: makes graft's native SQL functions
  * part of every session built with
  * `--conf spark.sql.extensions=graft.GraftSparkExtensions` (or
  * `.withExtensions(new GraftSparkExtensions)`), including
  * `newSession()` forks — the deployment-grade alternative to the
  * per-session [[GraftFunctions.register]].
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.graft.GraftFunctionRegistry.injectInto(e)
    // DV-aware lake reads on native scan nodes (plan upgrade only —
    // the V1 relation fallback keeps non-extended sessions correct)
    e.injectPostHocResolutionRule(s => new graft.lake.LakeMorExpansion(s))
    // maintenance SQL the stock grammar lacks: OPTIMIZE / VACUUM /
    // DESCRIBE HISTORY|DETAIL (everything else delegates untouched)
    e.injectParser((s, delegate) => new graft.lake.GraftSqlParser(s, delegate))
    // SQL change-data-feed surface: SELECT ... FROM table_changes(...)
    graft.lake.LakeTableChanges.injectInto(e)
  }
}
