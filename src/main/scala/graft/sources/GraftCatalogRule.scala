package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
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
}
