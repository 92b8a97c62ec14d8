package graft.spark

import graft.meta.expr.{Expr => GExpr, TrueExpr}
import graft.table.{MergeBuilder, SparkFilterConv}

import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.ColumnBridge

/** Session extensions (ref `spark3-extensions/.../IcebergSparkSessionExtensions.scala:39`):
  * routes SQL row-level commands on graft tables to the copy-on-write
  * machinery. Register with
  * `spark.sql.extensions=graft.spark.GraftExtensions`.
  *
  * On Spark 4 the DML statements parse and resolve natively, so unlike the
  * reference no parser extension is needed for them; the rewrite rule is the
  * analogue of the reference's `RewriteDelete`/`RewriteUpdate`/
  * `RewriteMergeInto` analyzer rules. DELETE with an exactly-convertible
  * condition is NOT intercepted — it flows through the native
  * `SupportsDelete` path on [[GraftSparkTable]].
  *
  * Design note — why a rule rather than `SupportsRowLevelOperations`: the
  * native group-based interface requires a full DSv2 `BatchWrite` (Spark's
  * `ReplaceData` writes through `Write.toBatch`; the `V1Write` fallback the
  * read/append path uses is not accepted there), i.e. a hand-rolled
  * executor-side parquet `DataWriter` for every supported type. The engine's
  * whole write path is deliberately DataFrame-based (`Writes.writeDataFiles`
  * — Spark's parquet writer, codegen, fanout, footer metrics), so the rule
  * keeps one write path and mirrors exactly how the reference shipped
  * row-level SQL for the Spark versions it supported. Spark's own analyzer
  * rewrites run earlier in the same Resolution batch but leave DML nodes on
  * non-row-level-op tables untouched, which is what makes the interception
  * sound.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(spark => RewriteGraftDml(spark))
    ext.injectResolutionRule(spark => ResolveGraftViews(spark))
  }
}

/** One-shot command node: the DML has already been translated into a closure
  * over the graft table API; Spark executes it eagerly like any command. */
case class GraftDmlCommand(commandName: String, tableName: String,
    body: () => Unit) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = { body(); Nil }
  override def simpleString(maxFields: Int): String =
    s"GraftDmlCommand $commandName $tableName"
}

case class RewriteGraftDml(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftRelation(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftSparkTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSparkTable => Some((r, g))
        case _ => None
      }
      case _ => None
    }

  private def noSubquery(e: Expression): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        "Subqueries in row-level operation conditions are not supported")

  /** Resolved catalyst expression → Column over the rewrite DataFrames:
    * target attributes by name, source attributes as `_s_<name>`. */
  private def toCol(e: Expression, target: Seq[Attribute],
      source: Seq[Attribute] = Nil): Column = {
    noSubquery(e)
    val src = source.map(a => a.exprId -> a.name).toMap
    val tgt = target.map(a => a.exprId -> a.name).toMap
    ColumnBridge.column(e.transform {
      case a: AttributeReference if src.contains(a.exprId) =>
        UnresolvedAttribute(Seq(MergeBuilder.SourcePrefix + src(a.exprId)))
      case a: AttributeReference if tgt.contains(a.exprId) =>
        UnresolvedAttribute(Seq(tgt(a.exprId)))
    })
  }

  /** Assignment keys become dotted paths for nested SET (`s.a.b = …`) when
    * `allowNested` (UPDATE supports it via `Column.withField`; MERGE clause
    * projections are top-level only). */
  private def toAssignments(assignments: Seq[Assignment], target: Seq[Attribute],
      source: Seq[Attribute] = Nil, allowNested: Boolean = false): Map[String, Column] =
    assignments.map { a =>
      def keyPath(e: Expression): Seq[String] = e match {
        case ar: AttributeReference => Seq(ar.name)
        case org.apache.spark.sql.catalyst.expressions.GetStructField(child, _, nameOpt) =>
          keyPath(child) :+ nameOpt.getOrElse(
            throw new UnsupportedOperationException(s"Unnamed struct field in $e"))
        case other => throw new UnsupportedOperationException(
          s"Unsupported assignment key: $other")
      }
      val path = keyPath(a.key)
      if (path.size > 1 && !allowNested)
        throw new UnsupportedOperationException(
          s"Nested assignment ${path.mkString(".")} is only supported in UPDATE")
      path.mkString(".") -> toCol(a.value, target, source)
    }.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {

    case d @ DeleteFromTable(target, cond) if d.resolved =>
      graftRelation(target).map { case (r, g) =>
        noSubquery(cond)
        val (prune, exact) = SparkFilterConv.convertPartial(cond)
        if (exact) plan // native SupportsDelete path (DeleteFromTableExec)
        else GraftDmlCommand("DELETE", g.name,
          () => g.table.deleteRows(prune, toCol(cond, r.output)))
      }.getOrElse(plan)

    case u @ UpdateTable(target, assignments, condOpt) if u.resolved =>
      graftRelation(target).map { case (r, g) =>
        val set = toAssignments(assignments, r.output, allowNested = true)
        val body: () => Unit = condOpt match {
          case None => () => g.table.update(TrueExpr, set)
          case Some(c) =>
            noSubquery(c)
            val (prune, exact) = SparkFilterConv.convertPartial(c)
            if (exact) () => g.table.update(prune, set)
            else () => g.table.updateRows(prune, set, toCol(c, r.output))
        }
        GraftDmlCommand("UPDATE", g.name, body)
      }.getOrElse(plan)

    case m @ MergeIntoTable(target, sourcePlan, mergeCond,
        matchedActions, notMatchedActions, notMatchedBySourceActions,
        withSchemaEvolution) if m.resolved =>
      graftRelation(target).map { case (r, g) =>
        if (withSchemaEvolution) throw new UnsupportedOperationException(
          "MERGE WITH SCHEMA EVOLUTION is not supported")
        val tOut = r.output
        val sOut = sourcePlan.output
        val body: () => Unit = { () =>
          val srcDf = ColumnBridge.ofRows(spark, sourcePlan)
          val builder = g.table.mergeOn(srcDf, toCol(mergeCond, tOut, sOut))
          matchedActions.foreach {
            case UpdateAction(c, assigns, _) =>
              builder.whenMatchedUpdate(toAssignments(assigns, tOut, sOut),
                c.map(toCol(_, tOut, sOut)))
            case DeleteAction(c) =>
              builder.whenMatchedDelete(c.map(toCol(_, tOut, sOut)))
            case other => throw new UnsupportedOperationException(
              s"Unsupported matched action: $other")
          }
          notMatchedActions.foreach {
            case InsertAction(c, assigns) =>
              builder.whenNotMatchedInsert(toAssignments(assigns, tOut, sOut),
                c.map(toCol(_, tOut, sOut)))
            case other => throw new UnsupportedOperationException(
              s"Unsupported not-matched action: $other")
          }
          notMatchedBySourceActions.foreach {
            case UpdateAction(c, assigns, _) =>
              builder.whenNotMatchedBySourceUpdate(toAssignments(assigns, tOut),
                c.map(toCol(_, tOut)))
            case DeleteAction(c) =>
              builder.whenNotMatchedBySourceDelete(c.map(toCol(_, tOut)))
            case other => throw new UnsupportedOperationException(
              s"Unsupported not-matched-by-source action: $other")
          }
          builder.execute()
        }
        GraftDmlCommand("MERGE", g.name, body)
      }.getOrElse(plan)

    case _ => plan
  }
}
