package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, CreateTableAsSelect, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.BooleanType

/** The resolution rule behind [[GraftCatalog]]: every
  * `DataSourceV2Relation` whose table is a [[GraftTable]] is replaced
  * with the SAME DSv1 relation the `graft-snapshot` views serve —
  * built by [[SnapshotSource.createRelation]] with the table root and
  * the pin the catalog resolved (`VERSION AS OF` → `versionAsOf`), so
  * catalog reads keep S32's planning-time entry-stats pruning, native
  * parquet pushdown, the pinned-view DML refusal marker, and the
  * S28/S33 DML routing (which recognizes tables by this relation's
  * file paths) — none of which a DSv2 Scan re-implementation would
  * get for free.
  *
  * The swap preserves the V2 relation's output attribute IDs (an
  * alias-Project mapped BY NAME), so references above it stay
  * resolved; columns the catalog pinned at load time project out of
  * whatever the relation serves. Runs in the analyzer's resolution
  * fixed point (injected via
  * `SparkSessionExtensions.injectResolutionRule` by
  * [[graft.GraftExtensions]]); idempotent because the matched node
  * type no longer exists after the swap.
  */
class GraftCatalogRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftTableOf(plan: LogicalPlan): Option[GraftTable] =
    plan match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] =>
        Some(r.table.asInstanceOf[GraftTable])
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      // ---- the writer-V2 surface (df.writeTo) and CTAS: swapped
      // for graft commands BEFORE the capability check can refuse
      // them (the table itself declares BATCH_READ only — writes are
      // plan rewrites onto the store ops, the S28/S33 architecture).
      // The write plans hold their target OUT of the child list, so
      // the read-relation swap below never rewrites it first.
      case a @ AppendData(r: DataSourceV2Relation, query, _, _, _, _)
          if graftTableOf(r).isDefined && query.resolved =>
        val t = graftTableOf(r).get
        refusePinned(t, "writeTo(...).append()")
        GraftV2AppendCommand(t.name(), t.root,
          GraftSqlDml.PlanBox(a.query))
      case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation,
          query, _, _, _)
          if graftTableOf(r).isDefined && query.resolved =>
        val t = graftTableOf(r).get
        refusePinned(t, "writeTo(...).overwritePartitions()")
        GraftV2OverwritePartitionsCommand(t.name(), t.root,
          GraftSqlDml.PlanBox(o.query))
      case o @ OverwriteByExpression(r: DataSourceV2Relation, cond,
          query, _, _, _, _)
          if graftTableOf(r).isDefined && query.resolved =>
        val t = graftTableOf(r).get
        refusePinned(t, "writeTo(...).overwrite(...)")
        cond match {
          case Literal(true, BooleanType) =>
            GraftV2TruncateOverwriteCommand(t.name(), t.root,
              GraftSqlDml.PlanBox(o.query))
          case other => throw new IllegalArgumentException(
            s"overwrite on a graft table supports only the " +
              s"whole-table form (.overwrite(lit(true))); got " +
              s"condition ${other.sql} — use .overwritePartitions() " +
              "for dynamic partition replacement, or the SQL DML " +
              "verbs (DELETE + INSERT) for predicate-scoped rewrites")
        }
      case c @ CreateTableAsSelect(
          ResolvedIdentifier(cat: GraftCatalog, ident), parts,
          query, _, _, ignoreIfExists, _) if query.resolved =>
        GraftCtasCommand(cat, ident, parts, GraftSqlDml.PlanBox(query),
          ignoreIfExists)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val params = Map("path" -> t.root) ++
          t.pinnedGen.map(g => "versionAsOf" -> g.toString)
        val rel = new SnapshotSource()
          .createRelation(session.sqlContext, params)
        val lr = LogicalRelation(rel)
        val byName = lr.output.map(a => a.name.toLowerCase -> a).toMap
        val aliased = r.output.map { o =>
          val src = byName.getOrElse(o.name.toLowerCase,
            throw new IllegalStateException(
              s"catalog table ${t.name()} resolved column ${o.name} " +
                "which the serving relation no longer carries — the " +
                "table schema changed between load and planning; " +
                "re-run the statement"))
          Alias(src, o.name)(exprId = o.exprId)
        }
        Project(aliased, lr)
    }

  private def refusePinned(t: GraftTable, what: String): Unit =
    if (t.pinnedGen.isDefined) throw new IllegalStateException(
      s"$what through a PINNED reference of ${t.name()} " +
        "(VERSION/TIMESTAMP AS OF) is refused: writes apply to the " +
        "SERVING generation, which this reference does not read")
}
