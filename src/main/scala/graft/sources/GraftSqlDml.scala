package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** The SQL DML surface of the pointer-served tables: `DELETE FROM`,
  * `UPDATE`, and the canonical-upsert `MERGE INTO` against a
  * `graft-snapshot` view route to the Scala DML ops
  * ([[ManifestStore.deleteWhere]]/[[ManifestStore.updateWhere]]/
  * [[ManifestStore.mergePartitions]]) — the reference's
  * write-disposition surface (bigquery.py:141's WRITE_APPEND /
  * WRITE_TRUNCATE dispositions, its only write control) lifted to the
  * statement level an analyst actually types, the way Delta/Iceberg
  * accept DML on their tables.
  *
  * Mechanism: [[graft.GraftExtensions]] injects [[GraftSqlParser]],
  * which delegates ALL parsing to Spark's parser and post-processes
  * exactly the three typed DML plans. When the target relation is a
  * temp view served by [[SnapshotSource]] (recognized by resolving
  * the view and reading the table ROOT off its file paths — the
  * `_writes/` layout is this library's own), the plan is replaced by
  * a [[LeafRunnableCommand]] that calls the corresponding store op;
  * any other target is left untouched for Spark's own handling, so
  * the extension is invisible to non-graft tables.
  *
  * Semantics pinned here:
  *  - DML applies to the TABLE the view resolves to, at its SERVING
  *    generation — the view itself stays pinned to the generation it
  *    resolved at creation (the read-your-resolution contract every
  *    pointer read has); re-create the view to see the result.
  *  - Each statement returns the committed generation (one `gen`
  *    row), so `spark.sql("DELETE ...").head.getLong(0)` is the
  *    time-travel handle of the new state.
  *  - Only the manifest layout takes DML (file-level rewrite scope is
  *    what makes a partition-scoped DELETE cheap); a snapshot-layout
  *    view refuses typed — republish is that layout's write path.
  *  - MERGE supports the canonical upsert — `ON` a conjunction of
  *    same-name column equalities, `WHEN MATCHED THEN UPDATE SET *`,
  *    `WHEN NOT MATCHED THEN INSERT *` — which is exactly
  *    [[ManifestStore.mergePartitions]]' contract. Conditional or
  *    column-list actions refuse with the supported form named:
  *    pretending to support per-column merge semantics it would
  *    silently approximate is worse than refusing.
  *
  * Condition/assignment expressions are carried UNRESOLVED (wrapped
  * in [[GraftSqlDml.ExprBox]] so the command node stays resolved) and
  * bound against the table's DataFrame at execution — the same late
  * binding as `functions.expr`, so there is no fragile SQL-string
  * round trip. Qualifiers naming the view or its alias are stripped
  * first (`v.price` → `price`): the execution-side DataFrame carries
  * no alias.
  */
object GraftSqlDml {

  /** Opaque expression carrier: NOT an Expression/TreeNode field, so
    * the command's `expressions` stay empty and checkAnalysis never
    * sees (and never refuses) the deliberately-unresolved condition.
    */
  final case class ExprBox(e: Expression) {
    override def toString: String = e.sql
  }

  /** A resolved DML target: the table root and its layout. */
  final case class Target(root: String, manifestLayout: Boolean)

  /** The table root behind a resolvable relation name, if it is a
    * graft pointer table: resolve the name, find the file relation,
    * and read the root off the first file path — `_writes/` (manifest
    * layout) and `_snapshots/` (snapshot layout) are this library's
    * own directory grammar. A path that merely CONTAINS one of those
    * segments could still be a foreign table's, so the candidate root
    * must also carry the pointer marker (`<root>/_current`) before
    * the statement is rerouted — a foreign parquet table stays
    * Spark's business. The zero-entry manifest relation carries its
    * root explicitly (no files to read it from).
    *
    * A view resolved through an explicit pin
    * (`versionAsOf`/`timestampAsOf`/`ref` —
    * [[SnapshotSource.PinnedOption]] on the relation) REFUSES here:
    * DML applies to the SERVING generation, and a statement typed
    * against a pinned view would silently mutate state the view's
    * reader never sees. Target an unpinned view instead.
    */
  private[sources] def targetOf(session: SparkSession,
                                name: Seq[String]): Option[Target] = {
    val quoted = name.map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")
    val analyzed =
      try session.table(quoted).queryExecution.analyzed
      catch { case _: org.apache.spark.sql.AnalysisException =>
        return None }
    def refusePinned(root: String): Nothing =
      throw new IllegalStateException(
        s"DML through a PINNED view of $root (versionAsOf/" +
          "timestampAsOf/ref) is refused: statements apply to the " +
          "SERVING generation, which this view does not read — " +
          "create an unpinned view of the table root and issue the " +
          "statement there")
    def isGraftRoot(root: String): Boolean =
      Tables.fsFor(session, root).exists(
        new org.apache.hadoop.fs.Path(s"$root/_current"))
    analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }.flatMap {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.rootPaths.headOption.map(_.toString).flatMap { p =>
          val w = p.indexOf("/_writes/")
          val s = p.indexOf("/_snapshots/")
          val t =
            if (w >= 0) Some(Target(p.take(w), manifestLayout = true))
            else if (s >= 0)
              Some(Target(p.take(s), manifestLayout = false))
            else None
          t.filter(c => isGraftRoot(c.root)).map { c =>
            if (org.apache.spark.sql.GraftSqlBridge
                .relationOption(h, SnapshotSource.PinnedOption)
                .contains("true")) refusePinned(c.root)
            c
          }
        }
      case e: EmptySnapshotRelation =>
        if (e.pinned) refusePinned(e.root)
        Some(Target(e.root, manifestLayout = true))
      case _ => None
    }
  }

  /** The (multipart name, alias) of a DML target plan — an
    * `UnresolvedRelation`, optionally aliased.
    */
  private[sources] def nameOf(table: LogicalPlan)
      : Option[(Seq[String], Option[String])] = table match {
    case SubqueryAlias(id, u: UnresolvedRelation) =>
      Some((u.multipartIdentifier, Some(id.name)))
    case u: UnresolvedRelation => Some((u.multipartIdentifier, None))
    case _ => None
  }

  /** Strip qualifiers that name the view or its alias: the execution
    * side binds against the bare table DataFrame, where `v.price`
    * cannot resolve but `price` can.
    */
  private[sources] def stripQuals(e: Expression, name: Seq[String],
                                  alias: Option[String]): Expression = {
    val prefixes: Set[Seq[String]] =
      (alias.map(Seq(_)).toSeq ++
        name.indices.map(i => name.drop(i)))
        .map(_.map(_.toLowerCase)).toSet
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size > 1 &&
          prefixes(a.nameParts.init.map(_.toLowerCase)) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** The merge keys of a canonical-upsert ON clause: a conjunction of
    * same-name column equalities (`t.k = s.k [AND ...]`). Anything
    * else refuses with the supported form named.
    */
  private[sources] def mergeKeysOf(cond: Expression): Seq[String] =
    conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        "MERGE INTO a graft table supports the canonical upsert " +
          "only: ON must be a conjunction of same-name column " +
          s"equalities (t.k = s.k), got ${other.sql}")
    }

  private[sources] def requireManifest(t: Target, verb: String): Unit =
    if (!t.manifestLayout) throw new IllegalStateException(
      s"$verb needs the manifest layout (file-level rewrite scope); " +
        s"${t.root} is a snapshot table whose generations are full " +
        "copies — publish a corrected snapshot instead " +
        "(SnapshotStore.publish), or migrate to ManifestStore")
}

/** `DELETE FROM <graft view> WHERE <cond>` →
  * [[ManifestStore.deleteWhere]]. Returns the committed generation.
  */
case class GraftDeleteCommand(table: Seq[String],
                              target: GraftSqlDml.Target,
                              cond: GraftSqlDml.ExprBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireManifest(target, "DELETE")
    Seq(Row(ManifestStore.deleteWhere(spark, target.root,
      org.apache.spark.sql.GraftSqlBridge.toColumn(cond.e))))
  }
}

/** `UPDATE <graft view> SET c = e, ... [WHERE <cond>]` →
  * [[ManifestStore.updateWhere]]. Returns the committed generation.
  */
case class GraftUpdateCommand(table: Seq[String],
                              target: GraftSqlDml.Target,
                              set: Seq[(String, GraftSqlDml.ExprBox)],
                              cond: GraftSqlDml.ExprBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireManifest(target, "UPDATE")
    Seq(Row(ManifestStore.updateWhere(spark, target.root,
      org.apache.spark.sql.GraftSqlBridge.toColumn(cond.e),
      set.map { case (c, b) =>
        c -> org.apache.spark.sql.GraftSqlBridge.toColumn(b.e) })))
  }
}

/** `MERGE INTO <graft view> USING <source> ON t.k = s.k
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  * [[ManifestStore.mergePartitions]] (the partition-scoped upsert).
  * Returns the committed generation.
  */
case class GraftMergeCommand(table: Seq[String],
                             target: GraftSqlDml.Target,
                             source: Seq[String],
                             keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireManifest(target, "MERGE")
    val quoted = source.map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")
    Seq(Row(ManifestStore.mergePartitions(spark, spark.table(quoted),
      target.root, keys)))
  }
}

/** The injected parser: Spark's parser for everything, plus the DML
  * routing described on [[GraftSqlDml]]. Statements whose target is
  * not a graft pointer view pass through byte-identical.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlDml._

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable =>
      nameOf(d.table).flatMap { case (name, alias) =>
        targetOf(session, name).map { t =>
          GraftDeleteCommand(name, t,
            ExprBox(stripQuals(d.condition, name, alias)))
        }
      }.getOrElse(plan)
    case u: UpdateTable =>
      nameOf(u.table).flatMap { case (name, alias) =>
        targetOf(session, name).map { t =>
          val set = u.assignments.map {
            case Assignment(k: UnresolvedAttribute, v) =>
              k.nameParts.last ->
                ExprBox(stripQuals(v, name, alias))
            case a => throw new IllegalArgumentException(
              "UPDATE on a graft table needs plain column " +
                s"assignment targets, got ${a.key.sql}")
          }
          val cond = u.condition.getOrElse(
            org.apache.spark.sql.catalyst.expressions.Literal(true))
          GraftUpdateCommand(name, t, set,
            ExprBox(stripQuals(cond, name, alias)))
        }
      }.getOrElse(plan)
    case m: MergeIntoTable =>
      nameOf(m.targetTable).flatMap { case (name, _) =>
        targetOf(session, name).map { t =>
          val src = nameOf(m.sourceTable).map(_._1).getOrElse(
            throw new IllegalArgumentException(
              "MERGE INTO a graft table needs a NAMED source table/" +
                "view (register a subquery as a temp view first)"))
          if (m.withSchemaEvolution) throw new IllegalArgumentException(
            "MERGE ... WITH SCHEMA EVOLUTION is not supported on a " +
              "graft table — widen the schema with a publish first")
          (m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions) match {
            case (Seq(UpdateStarAction(None)),
                  Seq(InsertStarAction(None)), Seq()) => ()
            case _ => throw new IllegalArgumentException(
              "MERGE INTO a graft table supports the canonical " +
                "upsert only: WHEN MATCHED THEN UPDATE SET * " +
                "WHEN NOT MATCHED THEN INSERT * (no conditions, no " +
                "column lists, no BY SOURCE clauses)")
          }
          GraftMergeCommand(name, t, src,
            mergeKeysOf(m.mergeCondition))
        }
      }.getOrElse(plan)
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext)
      : LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
