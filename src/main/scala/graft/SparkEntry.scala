package graft

import graft.operators.{GroupedTopN, TopNConfig}
import graft.queries.{LakeQueries, PipelineQueries, RelationalQueries, StreamingQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allQueryDefs =
    RelationalQueries.all ++ PipelineQueries.all ++ StreamingQueries.all ++
      LakeQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-3 customers per nation by account balance, with nation names —
    * grouped top-N (WindowGroupLimit) over a broadcast join.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val joined = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select("n_name", "c_custkey", "c_name", "c_acctbal")
    GroupedTopN.transform(
      TopNConfig("c_acctbal", 3), Seq("n_name"), Seq("c_custkey"))(joined)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueryDefs.map(q => q.name -> q.build).toMap

  /** name → oracle kind ("static" | "generated" | "rows-only") for
    * every declared query — the source of truth SURVEY §8's counts are
    * regenerated from (`graft.tools.SurveyCounts`), so the doc's
    * claims can never drift from the registry.
    */
  def oracleKinds: Seq[(String, String)] =
    allQueryDefs.map { q =>
      q.name -> (if (q.oracle.isDefined) "static"
                 else if (q.oracleGen.isDefined) "generated"
                 else "rows-only")
    }.sortBy(_._1)

  /** sfDir the data-dependent oracle generators should train against;
    * set by [[Verify]] before it dumps [[oracleSql]] so generated
    * oracles (inlined k-means centroids) match the queries' run.
    */
  @volatile var oracleSfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Data-dependent oracles (QueryDef.oracleGen) are resolved here
    * against [[oracleSfDir]]; a generator failure degrades its query to
    * the rows-only check rather than failing the whole dump.
    */
  def oracleSql: Map[String, String] =
    oracleSql(SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "oracleSql needs a live SparkSession (generated oracles train " +
          "on data); start one or call oracleSql(spark) explicitly — " +
          "refusing to silently create a default-config session")))

  /** [[oracleSql]] against an explicit session — the generator loop
    * never falls back to `builder().getOrCreate()`, so a bare call
    * site can't silently spin up a default-config session.
    */
  def oracleSql(session: SparkSession): Map[String, String] =
    oracleSql(session, None)

  /** [[oracleSql]] restricted to `names` (None = all) — generated
    * oracles TRAIN (k-means fits etc.) at dump time, so a filtered
    * local run must skip the generators it doesn't need.
    */
  def oracleSql(session: SparkSession,
                names: Option[Set[String]]): Map[String, String] =
    allQueryDefs.filter(q => names.forall(_.contains(q.name))).flatMap { q =>
      val sql = q.oracle.orElse(q.oracleGen.flatMap { gen =>
        try Some(gen(session, oracleSfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[oracle] ${q.name} generator failed: ${e.getMessage}")
            None
        }
      })
      sql.map(q.name -> _)
    }.toMap
}
