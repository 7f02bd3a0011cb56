package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
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

  /** Opaque plan carrier (the [[ExprBox]] idea for a whole subtree):
    * lets [[GraftInsertCommand]] hold its INSERT query unresolved
    * without the analyzer walking into it.
    */
  final case class PlanBox(plan: LogicalPlan) {
    override def toString: String = plan.nodeName
  }

  /** A MERGE clause as parsed (expressions boxed unresolved;
    * `set`/`values = None` is the star form). Bound to Columns and
    * handed to [[ManifestStore.mergeInto]] at execution.
    */
  sealed trait SqlMergeClause
  final case class SqlMergeUpdate(cond: Option[ExprBox],
                                  set: Option[Seq[(String, ExprBox)]])
      extends SqlMergeClause
  final case class SqlMergeDelete(cond: Option[ExprBox])
      extends SqlMergeClause
  final case class SqlMergeInsert(cond: Option[ExprBox],
                                  values: Option[Seq[(String, ExprBox)]])
      extends SqlMergeClause

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
  /** Cheap PRE-PROBE before the full analysis [[targetOf]] runs: a
    * name that CANNOT be a graft target (no temp view of that name,
    * no graft catalog qualifying it, no session-catalog entry whose
    * recorded provider is graft's) skips the duplicated analysis
    * pass every parsed DML statement used to pay — the r17 advisory.
    * Catalog/metastore lookups only, no plan is built. A false
    * negative on an exotic shape degrades to Spark's own handling of
    * the statement (loud), never to a silent reroute.
    */
  private def mightBeGraft(session: SparkSession,
                           name: Seq[String]): Boolean = {
    val cat = session.sessionState.catalog
    def sessionProviderIsGraft: Boolean =
      try {
        val id = name.size match {
          case 1 => org.apache.spark.sql.catalyst
            .TableIdentifier(name.head)
          case 2 => org.apache.spark.sql.catalyst
            .TableIdentifier(name(1), Some(name.head))
          case _ => return false
        }
        cat.getTempViewOrPermanentTableMetadata(id)
          .provider.exists(_.contains("graft"))
      } catch { case scala.util.control.NonFatal(_) => false }
    def headIsGraftCatalog: Boolean =
      name.size >= 2 && {
        try session.sessionState.catalogManager.catalog(name.head)
          .isInstanceOf[GraftCatalog]
        catch { case scala.util.control.NonFatal(_) => false }
      }
    (name.size == 1 && cat.getRawTempView(name.head).isDefined) ||
      (name.size >= 2 && name.head == "global_temp") ||
      headIsGraftCatalog || sessionProviderIsGraft
  }

  private[sources] def targetOf(session: SparkSession,
                                name: Seq[String]): Option[Target] = {
    if (!mightBeGraft(session, name)) return None
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
      case d: DvSnapshotRelation =>
        // a DV-bearing generation is an ordinary manifest table to
        // DML (a COW statement folds its vectors)
        if (d.pinned) refusePinned(d.root)
        Some(Target(d.root, manifestLayout = true))
      case _ => None
    }
  }

  /** Resolve a STREAMING surface's target string — either a
    * filesystem path (passed through) or a catalog/view identifier
    * (`cat.ns.table`, a `graft-snapshot` view name) resolved to its
    * graft table root via the same analysis [[targetOf]] uses. A
    * string containing a path separator is always a path; an
    * identifier that does not resolve to a graft table falls back to
    * being treated as a path (the caller's own typed errors then
    * name it).
    */
  private[graft] def resolveTableOrPath(session: SparkSession,
                                        s: String): String =
    if (s.contains('/') || s.contains('\\')) s
    else {
      val parts =
        try session.sessionState.sqlParser.parseMultipartIdentifier(s)
        catch { case _: Exception => return s }
      try targetOf(session, parts).map(_.root).getOrElse(s)
      catch { case _: Exception => s }
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

  /** The lower-cased qualifier prefixes that address a relation: its
    * alias, or any suffix of its multipart name (`db.t` is reachable
    * as `db.t.c` and `t.c`).
    */
  private def prefixesOf(name: Seq[String],
                         alias: Option[String]): Set[Seq[String]] =
    (alias.map(Seq(_)).toSeq ++ name.indices.map(i => name.drop(i)))
      .map(_.map(_.toLowerCase)).toSet

  /** Bind a MATCHED-clause expression (condition or assignment RHS)
    * to [[ManifestStore.mergeInto]]'s evaluation frame: target
    * columns stay bare, source columns take the `__graft_src_`
    * prefix. Qualified references resolve by their qualifier; bare
    * ones by which schema holds the name — present in BOTH refuses
    * (qualify it), the SQL ambiguity rule.
    */
  private[sources] def bindMatched(e: Expression,
                                   tName: Seq[String],
                                   tAlias: Option[String],
                                   sName: Seq[String],
                                   sAlias: Option[String],
                                   tCols: Set[String],
                                   sCols: Set[String]): Expression = {
    val tPre = prefixesOf(tName, tAlias)
    val sPre = prefixesOf(sName, sAlias)
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        val q = a.nameParts.init.map(_.toLowerCase)
        if (tPre(q)) UnresolvedAttribute(Seq(a.nameParts.last))
        else if (sPre(q))
          UnresolvedAttribute(Seq(s"__graft_src_${a.nameParts.last}"))
        else a
      case a: UnresolvedAttribute =>
        val n = a.nameParts.head.toLowerCase
        if (tCols(n) && sCols(n)) throw new IllegalArgumentException(
          s"ambiguous column ${a.nameParts.head} in MERGE clause: it " +
            "exists in both target and source — qualify it " +
            "(t.col / s.col)")
        else if (sCols(n))
          UnresolvedAttribute(Seq(s"__graft_src_${a.nameParts.head}"))
        else a
    }
  }

  /** Bind a NOT-MATCHED (INSERT) expression: the frame is the SOURCE
    * rows alone, so source references go bare and target references
    * refuse (there is no matched target row to read).
    */
  private[sources] def bindInsert(e: Expression,
                                  tName: Seq[String],
                                  tAlias: Option[String],
                                  sName: Seq[String],
                                  sAlias: Option[String],
                                  tCols: Set[String],
                                  sCols: Set[String]): Expression = {
    val tPre = prefixesOf(tName, tAlias)
    val sPre = prefixesOf(sName, sAlias)
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        val q = a.nameParts.init.map(_.toLowerCase)
        if (sPre(q)) UnresolvedAttribute(Seq(a.nameParts.last))
        else if (tPre(q)) throw new IllegalArgumentException(
          s"WHEN NOT MATCHED clauses cannot reference target " +
            s"columns (${a.nameParts.mkString(".")}): there is no " +
            "matched target row")
        else a
    }
  }

  /** Bind a BY-SOURCE expression: the frame is the TARGET rows
    * alone — source references refuse (there is no matched source
    * row), the SQL rule.
    */
  private[sources] def bindBySource(e: Expression,
                                    tName: Seq[String],
                                    tAlias: Option[String],
                                    sName: Seq[String],
                                    sAlias: Option[String]): Expression = {
    val tPre = prefixesOf(tName, tAlias)
    val sPre = prefixesOf(sName, sAlias)
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        val q = a.nameParts.init.map(_.toLowerCase)
        if (tPre(q)) UnresolvedAttribute(Seq(a.nameParts.last))
        else if (sPre(q)) throw new IllegalArgumentException(
          s"WHEN NOT MATCHED BY SOURCE clauses cannot reference " +
            s"source columns (${a.nameParts.mkString(".")}): there " +
            "is no matched source row")
        else a
    }
  }

  /** The assignment target's bare column name — refusing qualifiers
    * that name anything but the target relation.
    */
  private[sources] def assignTarget(a: Assignment,
                                    tName: Seq[String],
                                    tAlias: Option[String]): String =
    a.key match {
      case k: UnresolvedAttribute =>
        if (k.nameParts.size > 1 &&
            !prefixesOf(tName, tAlias)(
              k.nameParts.init.map(_.toLowerCase)))
          throw new IllegalArgumentException(
            s"assignment target ${k.nameParts.mkString(".")} must " +
              "name a TARGET column")
        k.nameParts.last
      case other => throw new IllegalArgumentException(
        "assignment targets must be plain column references, got " +
          other.sql)
    }

  /** The lower-cased column set of a resolvable relation. */
  private[sources] def columnsOf(session: SparkSession,
                                 name: Seq[String]): Set[String] = {
    val quoted = name.map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")
    session.table(quoted).schema.fieldNames
      .map(_.toLowerCase).toSet
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

/** The GENERAL `MERGE INTO` (the CDC-apply shape): conditional
  * `WHEN MATCHED [AND cond] THEN UPDATE SET c = e / DELETE`,
  * column-list assignments, conditional inserts, and
  * `WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE` — routed to
  * [[ManifestStore.mergeInto]], ONE generation commit composing the
  * partition-scoped primitives. Returns the committed generation.
  * (The canonical star-only upsert keeps its dedicated
  * [[GraftMergeCommand]] → [[ManifestStore.mergePartitions]] route.)
  */
case class GraftMergeIntoCommand(table: Seq[String],
                                 target: GraftSqlDml.Target,
                                 source: Seq[String],
                                 keys: Seq[String],
                                 matched: Seq[GraftSqlDml.SqlMergeClause],
                                 notMatched: Seq[GraftSqlDml.SqlMergeClause],
                                 bySource: Seq[GraftSqlDml.SqlMergeClause])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import GraftSqlDml._
    GraftSqlDml.requireManifest(target, "MERGE")
    val quoted = source.map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")
    val toCol = org.apache.spark.sql.GraftSqlBridge.toColumn _
    def conv(c: SqlMergeClause): ManifestStore.MergeClause = c match {
      case SqlMergeUpdate(cond, set) => ManifestStore.MergeUpdate(
        set.map(_.map { case (k, b) => k -> toCol(b.e) }),
        cond.map(b => toCol(b.e)))
      case SqlMergeDelete(cond) =>
        ManifestStore.MergeDelete(cond.map(b => toCol(b.e)))
      case SqlMergeInsert(cond, values) => ManifestStore.MergeInsert(
        values.map(_.map { case (k, b) => k -> toCol(b.e) }),
        cond.map(b => toCol(b.e)))
    }
    Seq(Row(ManifestStore.mergeInto(spark, spark.table(quoted),
      target.root, keys, matched.map(conv), notMatched.map(conv),
      bySource.map(conv))))
  }
}

/** `INSERT INTO <graft view> [(cols)] <query>` (and
  * `INSERT OVERWRITE`, the full-table replace) → the fourth DML
  * verb: an append publish that rewrites ONLY the partitions the new
  * rows land in ([[ManifestStore.append]]); OVERWRITE is the honest
  * `replaceAll` rebuild. Column mapping follows Spark's own INSERT
  * rules: positional with casts; a column list maps the query's
  * output to the named columns (the rest land NULL); `BY NAME` maps
  * by name. Returns the committed generation.
  */
case class GraftInsertCommand(table: Seq[String],
                              target: GraftSqlDml.Target,
                              query: GraftSqlDml.PlanBox,
                              userCols: Seq[String],
                              overwrite: Boolean,
                              byName: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    GraftSqlDml.requireManifest(target, "INSERT")
    val df = org.apache.spark.sql.GraftSqlBridge.dfOf(spark,
      query.plan)
    val gen = ManifestStore.currentGen(spark, target.root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at ${target.root}"))
    val m = ManifestStore.manifestAt(spark, target.root, gen)
    val schema =
      org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
    val aligned: org.apache.spark.sql.DataFrame =
      if (byName) {
        val missing =
          schema.fieldNames.filterNot(df.columns.contains)
        val unknown =
          df.columns.filterNot(schema.fieldNames.contains)
        require(missing.isEmpty && unknown.isEmpty,
          s"INSERT BY NAME must carry exactly the table's columns; " +
            s"missing [${missing.mkString(",")}], unknown " +
            s"[${unknown.mkString(",")}]")
        df.select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      } else if (userCols.nonEmpty) {
        require(userCols.distinct.size == userCols.size,
          s"duplicate INSERT columns: ${userCols.mkString(",")}")
        userCols.foreach(c => require(
          schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"INSERT column $c not in ${schema.fieldNames.mkString(",")}"))
        require(df.columns.length == userCols.size,
          s"INSERT column list has ${userCols.size} columns but the " +
            s"query produces ${df.columns.length}")
        val byTarget = userCols.map(_.toLowerCase)
          .zip(df.columns.toSeq).toMap
        df.select(schema.fields.toSeq.map { f =>
          byTarget.get(f.name.toLowerCase)
            .map(q => col(q).cast(f.dataType))
            .getOrElse(lit(null).cast(f.dataType)).as(f.name)
        }: _*)
      } else {
        require(df.columns.length == schema.fields.length,
          s"INSERT query produces ${df.columns.length} columns but " +
            s"the table has ${schema.fields.length} — positional " +
            "INSERT needs the full width (use a column list)")
        df.select(schema.fields.toSeq.zip(df.columns.toSeq).map {
          case (f, q) => col(q).cast(f.dataType).as(f.name)
        }: _*)
      }
    val committed =
      if (overwrite)
        ManifestStore.publish(spark, aligned, target.root, m.partCol,
          replaceAll = true)
      else ManifestStore.append(spark, aligned, target.root)
    Seq(Row(committed))
  }
}

/** The injected parser: Spark's parser for everything, plus the DML
  * routing described on [[GraftSqlDml]]. Statements whose target is
  * not a graft pointer view pass through byte-identical.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlDml._

  // ---- the MAINTENANCE verbs (tried BEFORE Spark's grammar: ----
  // OPTIMIZE/VACUUM/FSCK are not Spark statements; DESCRIBE
  // HISTORY would mis-parse as a column describe; SHOW PARTITIONS
  // would refuse on a DSv2 table). A statement whose target is not
  // a graft table falls through to the delegate untouched.

  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([^\s;()]+)(?:\s+TARGET\s+(\d+))?(?:\s+SORT\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([^\s;()]+)\s*;?\s*$""".r
  private val FsckRe =
    """(?is)^\s*FSCK\s+(REPAIR\s+)?TABLE\s+([^\s;()]+)\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+([^\s;()]+)\s*;?\s*$""".r
  private val ShowPartsRe =
    """(?is)^\s*SHOW\s+PARTITIONS\s+([^\s;()]+)\s*;?\s*$""".r

  private def graftTarget(ident: String)
      : Option[(Seq[String], Target)] = {
    val name =
      try delegate.parseMultipartIdentifier(ident)
      catch { case _: Exception => return None }
    targetOf(session, name).map(t => (name, t))
  }

  private def maintenance(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(ident, tgt, sort) =>
        graftTarget(ident).map { case (name, t) =>
          GraftOptimizeCommand(name, t,
            Option(tgt).map(_.toLong),
            Option(sort).toSeq.flatMap(_.split(','))
              .map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty))
        }
      case VacuumRe(ident) =>
        graftTarget(ident).map { case (name, t) =>
          GraftVacuumCommand(name, t)
        }
      case FsckRe(repair, ident) =>
        graftTarget(ident).map { case (name, t) =>
          if (repair != null) GraftFsckRepairCommand(name, t)
          else GraftFsckCommand(name, t)
        }
      case HistoryRe(ident) =>
        graftTarget(ident).map { case (name, t) =>
          GraftHistoryCommand(name, t)
        }
      case ShowPartsRe(ident) =>
        graftTarget(ident).map { case (name, t) =>
          GraftShowPartitionsCommand(name, t)
        }
      case _ => None
    }

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
      nameOf(m.targetTable).flatMap { case (name, tAlias) =>
        targetOf(session, name).map { t =>
          val (src, sAlias) = nameOf(m.sourceTable).getOrElse(
            throw new IllegalArgumentException(
              "MERGE INTO a graft table needs a NAMED source table/" +
                "view (register a subquery as a temp view first)"))
          if (m.withSchemaEvolution) throw new IllegalArgumentException(
            "MERGE ... WITH SCHEMA EVOLUTION is not supported on a " +
              "graft table — widen the schema with a publish first")
          val keys = mergeKeysOf(m.mergeCondition)
          (m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions) match {
            case (Seq(UpdateStarAction(None)),
                  Seq(InsertStarAction(None)), Seq()) =>
              // the canonical star upsert keeps its dedicated
              // partition-scoped route (mergePartitions)
              GraftMergeCommand(name, t, src, keys)
            case (ma, nma, bsa) =>
              // the GENERAL form: bind every clause expression to
              // mergeInto's evaluation frames (schemas resolved here,
              // at parse time — both relations are named views)
              val tCols = columnsOf(session, name)
              val sCols = columnsOf(session, src)
              def mExpr(e: Expression): ExprBox = ExprBox(
                bindMatched(e, name, tAlias, src, sAlias, tCols, sCols))
              def iExpr(e: Expression): ExprBox = ExprBox(
                bindInsert(e, name, tAlias, src, sAlias, tCols, sCols))
              def bExpr(e: Expression): ExprBox = ExprBox(
                bindBySource(e, name, tAlias, src, sAlias))
              val matched = ma.map {
                case UpdateStarAction(cond) =>
                  SqlMergeUpdate(cond.map(mExpr), None)
                case UpdateAction(cond, assigns, fromStar) =>
                  if (fromStar) SqlMergeUpdate(cond.map(mExpr), None)
                  else SqlMergeUpdate(cond.map(mExpr),
                    Some(assigns.map(a =>
                      assignTarget(a, name, tAlias) ->
                        mExpr(a.value))))
                case DeleteAction(cond) =>
                  SqlMergeDelete(cond.map(mExpr))
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN MATCHED action: $other")
              }
              val notMatched = nma.map {
                case InsertStarAction(cond) =>
                  SqlMergeInsert(cond.map(iExpr), None)
                case InsertAction(cond, assigns) =>
                  SqlMergeInsert(cond.map(iExpr),
                    Some(assigns.map(a =>
                      assignTarget(a, name, tAlias) ->
                        iExpr(a.value))))
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN NOT MATCHED action: $other")
              }
              val bySource = bsa.map {
                case UpdateAction(cond, assigns, fromStar) =>
                  if (fromStar) throw new IllegalArgumentException(
                    "WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * " +
                      "— there is no source row to read; name the " +
                      "assignments")
                  else SqlMergeUpdate(cond.map(bExpr),
                    Some(assigns.map(a =>
                      assignTarget(a, name, tAlias) ->
                        bExpr(a.value))))
                case DeleteAction(cond) =>
                  SqlMergeDelete(cond.map(bExpr))
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN NOT MATCHED BY SOURCE action: " +
                    s"$other")
              }
              GraftMergeIntoCommand(name, t, src, keys, matched,
                notMatched, bySource)
          }
        }
      }.getOrElse(plan)
    case ins: InsertIntoStatement =>
      nameOf(ins.table).flatMap { case (name, _) =>
        targetOf(session, name).map { t =>
          if (ins.partitionSpec.nonEmpty)
            throw new IllegalArgumentException(
              "INSERT with a static PARTITION spec is not supported " +
                "on a graft table — partition values ride in the rows")
          if (ins.ifPartitionNotExists)
            throw new IllegalArgumentException(
              "IF NOT EXISTS partitions are not supported on a graft " +
                "table")
          GraftInsertCommand(name, t, PlanBox(ins.query),
            ins.userSpecifiedCols, ins.overwrite, ins.byName)
        }
      }.getOrElse(plan)
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenance(sqlText).getOrElse(
      rewrite(delegate.parsePlan(sqlText)))
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext)
      : LogicalPlan =
    maintenance(sqlText).getOrElse(
      rewrite(delegate.parsePlanWithParameters(sqlText, ctx)))
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
