package graft.lake

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction,
  LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction}
import org.apache.spark.sql.graft.PlanBridge

/** Lets the table's COLUMN MAPPING win in `MERGE ... WITH SCHEMA
  * EVOLUTION`: a producer still emitting a column under its
  * pre-RENAME name would otherwise fork a brand-new column — the
  * stock `ResolveMergeIntoSchemaEvolution` rule matches source-only
  * columns by NAME against the target's logical schema, and the old
  * name no longer appears there.
  *
  * The remap happens at PARSE time (the evolution rule performs its
  * `alterTable` as an analysis side effect, earlier in the resolution
  * batch than any injected rule could run, so post-parse is the only
  * hook that reliably precedes it): for an evolving MERGE whose
  * target is a lake table with a column mapping, every assignment KEY
  * — the one position in the statement that is target-side by
  * construction (`UPDATE SET k = …`, `INSERT (k, …)`) — naming a
  * PHYSICAL column of a renamed logical column is rewritten to the
  * logical name. The evolution rule then finds no source-only
  * assignment to evolve, and the merge resolves against the mapped
  * column. Assignment VALUES, the ON condition, and star actions
  * (`UPDATE SET *`) are untouched: values and conditions may
  * legitimately reference a SOURCE column that happens to share the
  * old name, and star expansion stays the documented by-source-name
  * contract (pin: LakeCatalogSpec "evolving MERGE source names").
  *
  * Only a single-part key, or a two-part key qualified by the
  * target's alias, is remapped — `x.y` could also be a struct-field
  * path, which renames never produce (column mapping is top-level
  * only).
  */
private[lake] object LakeMergeNameMapping {

  def apply(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case m: MergeIntoTable if m.withSchemaEvolution =>
        remap(session, m).getOrElse(m)
      case p => p
    }

  private def remap(session: SparkSession,
                    m: MergeIntoTable): Option[MergeIntoTable] = {
    val (alias, ident) = targetIdent(m.targetTable) match {
      case Some(t) => t
      case None => return None
    }
    // resolve the target to a lake root WITHOUT analysis: explicit
    // <catalog>.<ns...>.<table> against a LakeCatalog, else the
    // session's current catalog when that is a LakeCatalog. Any miss
    // (foreign catalog, v1 table, missing table) leaves the plan
    // untouched — parse must never fail for a statement analysis
    // would accept.
    val resolved: Option[(LakeCatalog, Seq[String])] =
      Try(PlanBridge.v2Catalog(session, ident.head)).toOption.collect {
        case lc: LakeCatalog if ident.length >= 2 => (lc, ident.tail)
      }.orElse(session.sessionState.catalogManager.currentCatalog match {
        case lc: LakeCatalog => Some((lc, ident))
        case _ => None
      })
    val (root, fs) = resolved.flatMap { case (cat, parts) =>
      Try {
        val root = cat.tableRoot(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.init.toArray, parts.last))
        (root, LakeLog.fileSystem(root,
          session.sparkContext.hadoopConfiguration))
      }.toOption
    } match {
      case Some(rf) => rf
      case None => return None
    }
    val snap = Try(LakeLog.snapshot(fs, new Path(root.toString), None))
      .getOrElse(return None)
    if (snap.colMap.isEmpty) return None
    // name matching below uses the SESSION RESOLVER, not ==: Spark
    // resolves identifiers case-insensitively by default, so `UPDATE
    // SET OldName = …` against physical `oldname` (or an alias
    // qualifier typed in another case) must still remap — an ==
    // comparison would let the differently-cased key escape and the
    // evolution rule fork a new column anyway
    val resolver = session.sessionState.analyzer.resolver
    val logical = org.apache.spark.sql.types.StructType
      .fromDDL(snap.schemaDdl).fieldNames.toSeq
    // physical -> logical, only where the physical name is NOT itself
    // a live logical column (then the plain-name resolution is
    // already unambiguous and must win)
    val reverse = snap.colMap.toSeq.collect {
      case (l, p) if p != l && !logical.exists(resolver(_, p)) => p -> l
    }
    if (reverse.isEmpty) return None
    def toLogical(n: String): Option[String] =
      reverse.collectFirst { case (p, l) if resolver(p, n) => l }
    def remapParts(parts: Seq[String]): Option[Seq[String]] = parts match {
      case Seq(n) => toLogical(n).map(Seq(_))
      case Seq(q, n) if alias.exists(resolver(_, q)) =>
        toLogical(n).map(l => Seq(q, l))
      case _ => None
    }
    var changed = false
    def remapKey(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e match {
        case ua: UnresolvedAttribute =>
          remapParts(ua.nameParts) match {
            case Some(np) => changed = true; UnresolvedAttribute(np)
            case None => ua
          }
        case other => other
      }
    def remapAssign(as: Seq[Assignment]): Seq[Assignment] =
      as.map(a => a.copy(key = remapKey(a.key)))
    def remapAction(a: MergeAction): MergeAction = a match {
      case u: UpdateAction => u.copy(assignments = remapAssign(u.assignments))
      case i: InsertAction => i.copy(assignments = remapAssign(i.assignments))
      case other => other
    }
    val out = m.copy(
      matchedActions = m.matchedActions.map(remapAction),
      notMatchedActions = m.notMatchedActions.map(remapAction),
      notMatchedBySourceActions =
        m.notMatchedBySourceActions.map(remapAction))
    if (changed) Some(out) else None
  }

  /** (target alias if present, multipart identifier) of the
    * still-unresolved merge target.
    */
  private def targetIdent(plan: LogicalPlan)
      : Option[(Option[String], Seq[String])] = plan match {
    case SubqueryAlias(id, child) =>
      targetIdent(child).map { case (_, parts) => (Some(id.name), parts) }
    case u: UnresolvedRelation => Some((None, u.multipartIdentifier))
    case _ => None
  }
}
