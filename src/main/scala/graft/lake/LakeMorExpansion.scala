package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Analyzer (post-hoc resolution) rule that rewrites a format read of
  * a deletion-vector'd snapshot — `LogicalRelation(LakeMorRelation)` —
  * into [[LakeTable.morScanIndexed]]'s native plan: vectorized
  * `FileScan parquet` over a [[LakeFileIndex]] for the clean AND the
  * DV'd files, the latter anti-joined against the KB-sized sidecar on
  * `_metadata.row_index`. Without this rule (no
  * `spark.sql.extensions=graft.GraftSparkExtensions`) the read still
  * works through [[LakeMorRelation]]'s `PrunedFilteredScan` fallback,
  * just without whole-stage codegen — the rule is a pure plan upgrade,
  * never a semantics change.
  *
  * Batch change-feed reads (`LakeCdfRelation`) get the same upgrade
  * via [[LakeTable.cdfFrame]].
  *
  * The splice keeps the relation's original output `exprId`s by
  * aliasing the expanded plan's columns, so references resolved
  * against the relation stay valid; each occurrence (self-joins) is
  * expanded separately with fresh internal ids.
  */
final class LakeMorExpansion(spark: SparkSession) extends Rule[LogicalPlan] {

  private def splice(l: LogicalRelation, df: DataFrame): LogicalPlan = {
    val expanded = df.queryExecution.analyzed
    val byName = expanded.output.map(a => a.name -> a).toMap
    Project(l.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), expanded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case l: LogicalRelation if l.relation.isInstanceOf[LakeMorRelation] =>
        val rel = l.relation.asInstanceOf[LakeMorRelation]
        splice(l, LakeTable.morScanIndexed(spark, rel.root, rel.snap))
      case l: LogicalRelation if l.relation.isInstanceOf[LakeCdfRelation] =>
        val rel = l.relation.asInstanceOf[LakeCdfRelation]
        splice(l,
          LakeTable.cdfFrame(spark, rel.root, rel.dataDdl, rel.from, rel.to))
    }
}
