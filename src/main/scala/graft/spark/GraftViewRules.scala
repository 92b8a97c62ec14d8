package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog}

/** SQL-view resolution for graft catalogs. Spark 4.1 ships the
  * `ViewCatalog` SPI but wires NOTHING to it — `CREATE VIEW cat.db.v`
  * throws `MISSING_CATALOG_ABILITY` for every non-session catalog and no
  * analyzer rule ever calls `loadView` (verified against the 4.1.2 jars;
  * the reference lineage ships its own parser + `ResolveViews` rule for
  * exactly this reason). This rule supplies the resolution half:
  *
  * an `UnresolvedRelation` whose catalog is a graft [[ViewCatalog]] and
  * whose identifier names a stored view expands to the view's parsed SQL,
  * with
  *  - IDENTIFIER QUALIFICATION: bare (1/2-part) table references inside
  *    the stored SQL are qualified with the CAPTURED creation context
  *    (`currentCatalog`/`currentNamespace`), so the view means the same
  *    tables no matter where it is read from — nested views qualify too
  *    and expand on subsequent rule passes;
  *  - SCHEMA PINNING: the expansion is projected onto the schema captured
  *    at CREATE time (by-name, with casts) — `SELECT *` views keep their
  *    frozen column list when the base table later adds columns, and a
  *    dropped/retyped column fails analysis loudly instead of silently
  *    shifting the view's shape.
  *
  * A self-referential view cycle is caught by the analyzer's iteration
  * limit (loud failure), mirroring `spark.sql.view.maxNestedViewDepth`'s
  * job for session views. */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewOf(parts: Seq[String]): Option[(ViewCatalog, Identifier, View)] = {
    if (parts.length < 2) return None
    val catalogs = spark.sessionState.catalogManager
    if (!catalogs.isCatalogRegistered(parts.head)) return None
    catalogs.catalog(parts.head) match {
      case vc: ViewCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        if (vc.viewExists(ident)) Some((vc, ident, vc.loadView(ident)))
        else None
      case _ => None
    }
  }

  /** Qualify bare relation names inside a view body with the captured
    * creation context (the light version of the reference's
    * rewriteIdentifiers): 1-part `t` → `cat.ns….t`, 2-part `db.t` →
    * `cat.db.t`; 3+-part names are already absolute. Walks INTO subquery
    * expressions (IN/EXISTS/scalar) — a bare name there must mean the
    * captured context too, not whatever catalog the reader happens to be
    * in. Runs AFTER [[cteSubstitute]], so CTE-defined names are already
    * `CTERelationRef`s and never get mis-qualified as tables. */
  private def qualify(plan: LogicalPlan, view: View): LogicalPlan =
    plan.transformUpWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
        UnresolvedRelation(
          (view.currentCatalog() +: view.currentNamespace().toSeq) :+
            u.multipartIdentifier.head,
          u.options, u.isStreaming)
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
        UnresolvedRelation(
          view.currentCatalog() +: u.multipartIdentifier,
          u.options, u.isStreaming)
    }

  /** The analyzer's Substitution batch (which owns CTESubstitution) runs
    * ONCE, before resolution — a view body spliced in DURING resolution
    * arrives too late for it, so an `UnresolvedWith` in the body would
    * never substitute and the plan fails analysis. Run the substitution on
    * the body ourselves before qualification: CTE names become
    * `CTERelationRef`s (resolved by the fixed-point ResolveWithCTE rule),
    * and only genuine table names remain `UnresolvedRelation`s. */
  private def cteSubstitute(plan: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.catalyst.analysis.CTESubstitution(plan)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation =>
      viewOf(u.multipartIdentifier) match {
        case None => u
        case Some((_, ident, view)) =>
          val parsed = qualify(cteSubstitute(
            spark.sessionState.sqlParser.parseQuery(view.query())), view)
          val pinned = Project(
            view.schema().fields.toSeq.map(f =>
              Alias(Cast(UnresolvedAttribute.quoted(f.name), f.dataType),
                f.name)()),
            parsed)
          SubqueryAlias(ident.name(), pinned)
      }
  }
}
