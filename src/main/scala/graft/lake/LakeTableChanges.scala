package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL surface for the change-data feed: the `table_changes` table-
  * valued function (the Delta-parity spelling), registered through
  * `SparkSessionExtensions.injectTableFunction` so a SQL-only user
  * can read a lake table's row-level history with no API call:
  *
  * {{{
  *   SELECT * FROM table_changes('cat.ns.orders', 2, 4)
  *   SELECT * FROM table_changes('/path/to/table', 2)         -- to latest
  *   SELECT * FROM table_changes('t', '2026-01-01 00:00:00',
  *                               '2026-02-01 00:00:00')
  * }}}
  *
  * Both bounds are INCLUSIVE commit versions (Delta's contract —
  * `table_changes(t, 2, 4)` returns the changes commits 2, 3 and 4
  * made), mapped onto [[LakeTable.scanChanges]]'s exclusive-from form
  * as `scanChanges(start-1, end)`. Version 0 (the create commit) is a
  * legal start: its adds arrive as inserts. String bounds are
  * timestamps (the batch `timestampAsOf` grammar: >= 10 digits =
  * epoch millis, else a UTC timestamp string), resolved like Delta
  * resolves CDF timestamps — start = first commit AT OR AFTER the
  * instant, end = last commit at or before it. The whole plan is
  * built at RESOLUTION time, so a range dipping below the vacuum
  * floor refuses loudly here — same guard, same message as the API
  * path — before any task opens a file.
  *
  * The returned plan is the scanChanges frame's logical plan spliced
  * in as a named relation — per-commit file-pruned unions, no
  * full-table read for append commits, exactly the API's cost.
  */
object LakeTableChanges {

  private val ident = FunctionIdentifier("table_changes")

  private val info = new ExpressionInfo(getClass.getName.stripSuffix("$"),
    "table_changes")

  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectTableFunction((ident, info, builder _))

  private def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes takes (table, startVersion|startTimestamp" +
        "[, endVersion|endTimestamp])")
    val spark = SparkSession.active
    val root = resolveRoot(spark, stringArg(args.head, "table"))
    val fs = LakeLog.fileSystem(new Path(root),
      spark.sparkContext.hadoopConfiguration)
    val latest = LakeLog.latestVersion(fs, new Path(root)).getOrElse(
      throw new IllegalArgumentException(s"no lake table at $root"))
    val start = versionArg(args(1), "start", fs, root,
      ts => LakeLog.firstVersionAtOrAfter(fs, new Path(root), ts))
    val end =
      if (args.length < 3) latest
      else versionArg(args(2), "end", fs, root,
        ts => LakeLog.versionAtTimestamp(fs, new Path(root), ts))
    // an inverted range refuses HERE: mapped onto the exclusive form
    // it would become a legal empty range (start-1 >= end), silently
    // returning zero rows for what is almost certainly a typo
    require(start <= end,
      s"table_changes: start version $start is after end version $end")
    LakeTable.scanChanges(spark, root, start - 1, end)
      .queryExecution.logical
  }

  /** `'cat.ns.t'`-style identifier against a [[LakeCatalog]] (the
    * session's current catalog fills in when the first part names no
    * registered catalog), or a filesystem root when the string looks
    * like a path.
    */
  private def resolveRoot(spark: SparkSession, t: String): String =
    if (t.startsWith("/") || t.contains(":/")) t
    else {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
      val explicit =
        if (parts.length < 2) None
        else scala.util.Try(PlanBridge.v2Catalog(spark, parts.head))
          .toOption.collect { case lc: LakeCatalog => (lc, parts.tail) }
      val (cat, rel) = explicit.orElse {
        spark.sessionState.catalogManager.currentCatalog match {
          case lc: LakeCatalog => Some((lc, parts))
          case _ => None
        }
      }.getOrElse(throw new IllegalArgumentException(
        s"table_changes: '$t' does not resolve to a graft-lake table " +
          "(name a lake catalog explicitly, set one as the current " +
          "catalog, or pass the table root path)"))
      cat.tableRoot(Identifier.of(rel.init.toArray, rel.last)).toString
    }

  private def stringArg(e: Expression, name: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"table_changes: $name must be a string literal, got $other")
  }

  /** An integer literal is a commit version; a string literal is a
    * timestamp resolved by `byTs`.
    */
  private def versionArg(e: Expression, name: String,
                         fs: org.apache.hadoop.fs.FileSystem, root: String,
                         byTs: Long => Long): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case Literal(v, StringType) if v != null =>
      val t = v.toString.trim
      val millis =
        if (t.length >= 10 && t.forall(_.isDigit)) t.toLong
        else LakeSqlStatements.utcMillis(t)
      byTs(millis)
    case other => throw new IllegalArgumentException(
      s"table_changes: $name must be an integer version or a " +
        s"timestamp string literal, got $other")
  }
}
