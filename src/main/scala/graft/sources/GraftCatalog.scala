package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path

/** A DSv2 `TableCatalog` over the pointer-table layouts — the piece
  * that removes the temp-view ceremony from the SQL surface (the
  * ergonomics Delta/Iceberg users get from their catalogs; the
  * reference's analog is the BigQuery dataset.table namespace,
  * bigquery.py:27's implicit project/dataset addressing):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /warehouse
  *
  *   CREATE TABLE graft.gold.fact (k BIGINT, y STRING, v DOUBLE)
  *     PARTITIONED BY (y);
  *   INSERT INTO graft.gold.fact SELECT ...;
  *   SELECT * FROM graft.gold.fact;                 -- serving gen
  *   SELECT * FROM graft.gold.fact VERSION AS OF 3; -- time travel
  *   SELECT * FROM graft.gold.fact TIMESTAMP AS OF '...';
  *   DELETE FROM graft.gold.fact WHERE ...;         -- S28 DML
  * }}}
  *
  * Layout: an identifier `graft.ns....name` IS the directory
  * `<warehouse>/ns/.../name` — a namespace is a directory, a table is
  * a root carrying the `_current` pointer marker (either pointer
  * layout; `CREATE TABLE` bootstraps the MANIFEST layout, generation
  * 1 empty). No side catalog state exists: the filesystem tree is the
  * catalog, so every session (and every engine with filesystem
  * access) sees the same tables — the external-catalog posture of the
  * lakehouse formats.
  *
  * READ PLANNING stays DSv1: [[GraftTable]] is a metadata shell
  * (schema/partitioning for the analyzer, version pins for
  * `VERSION/TIMESTAMP AS OF`), and the injected resolution rule
  * ([[GraftCatalogRule]], registered by [[graft.GraftExtensions]])
  * replaces its `DataSourceV2Relation` with the SAME stats-pruned
  * file relation the `graft-snapshot` views serve (S32's
  * `GraftStatsFileIndex` — planning-time entry-stats skipping,
  * native parquet pushdown). DML and `INSERT INTO` ride the S28/S33
  * parser routes unchanged: the rewritten relation carries the table
  * root (and the pinned marker for `VERSION AS OF` reads, so DML
  * through a pinned reference keeps refusing typed). The catalog
  * therefore REQUIRES the extensions
  * (`spark.sql.extensions=graft.GraftExtensions`);
  * [[GraftTable.newScanBuilder]] refuses with that remedy if the rule
  * never ran.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs a warehouse option " +
          s"(spark.sql.catalog.$name.warehouse = <dir>)"))
      .stripSuffix("/")
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  private def dirOf(namespace: Seq[String], leaf: String): String =
    (warehouse +: namespace :+ leaf).mkString("/")

  private def rootOf(ident: Identifier): String =
    dirOf(ident.namespace.toSeq, ident.name)

  /** The directory an identifier addresses — what the CTAS command
    * ([[GraftCtasCommand]]) publishes into before the table exists.
    */
  private[sources] def rootFor(ident: Identifier): String =
    rootOf(ident)

  private def isTable(root: String): Boolean =
    Tables.fsFor(spark, root).exists(new Path(s"$root/_current"))

  // ---- tables ----

  override def listTables(namespace: Array[String])
      : Array[Identifier] = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val fs = Tables.fsFor(spark, dir)
    if (!fs.exists(new Path(dir)))
      throw new NoSuchNamespaceException(namespace)
    fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory &&
        isTable(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(rootOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    new GraftTable(fullName(ident), root, None)
  }

  /** `VERSION AS OF <v>`: the pinned generation. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val gen = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"VERSION AS OF on a graft table takes a generation number, " +
          s"got '$version'"))
    new GraftTable(fullName(ident), root, Some(gen))
  }

  /** `TIMESTAMP AS OF <t>`: Spark hands MICROseconds since epoch;
    * resolution to a generation happens here, once — the read is
    * then pinned exactly like `VERSION AS OF`.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    val tsMs = timestamp / 1000L
    val isManifest = Tables.fsFor(spark, root).exists(
      new Path(s"$root/_manifests"))
    val gen =
      if (isManifest) ManifestStore.genAsOfTimestamp(spark, root, tsMs)
      else SnapshotStore.genAsOfTimestamp(spark, root, tsMs)
    new GraftTable(fullName(ident), root, Some(gen))
  }

  private def fullName(ident: Identifier): String =
    (catName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  /** `CREATE TABLE ... PARTITIONED BY (cols)`: bootstrap an EMPTY
    * manifest-layout generation 1 carrying the declared schema and
    * the identity partition columns — the normal publish path with
    * zero rows, so every later statement (INSERT/DML/OPTIMIZE) finds
    * a well-formed table. Non-identity transforms (bucket/days/...)
    * refuse: the manifest layout partitions on VALUES.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String])
      : Table = {
    val root = rootOf(ident)
    if (isTable(root)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t: Transform if t.name == "identity" =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new IllegalArgumentException(
        s"graft tables partition on column VALUES only " +
          s"(PARTITIONED BY (col)); got transform $other")
    }
    require(partCols.nonEmpty,
      "a graft manifest table needs PARTITIONED BY (at least one " +
        "column) — partition scope is what makes its DML/merge " +
        "rewrites cheap")
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in ${schema.fieldNames.mkString(",")}"))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    ManifestStore.publish(spark, empty, root,
      partCols.mkString(","), replaceAll = true)
    new GraftTable(fullName(ident), root, None)
  }

  /** `ALTER TABLE ... ADD COLUMNS` routes to the S29 WIDENING
    * publish — metadata-only (every prior entry carries verbatim
    * under the widened DDL; old files serve the new columns
    * null-backfilled) — and `RENAME COLUMN` to the S40 metadata-only
    * name mapping ([[ManifestStore.renameColumn]]). Everything else
    * keeps the S29 refusal: drops/re-types need the explicit
    * replaceAll rebuild.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new NoSuchTableException(ident)
    changes.foreach {
      case _: TableChange.AddColumn | _: TableChange.RenameColumn =>
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported on a graft " +
          "table: ADD COLUMNS widens (S29), RENAME COLUMN maps " +
          "names (S40); drop/re-type need an explicit replaceAll " +
          "rebuild")
    }
    val adds = changes.collect { case a: TableChange.AddColumn =>
      require(a.fieldNames.length == 1,
        "ADD COLUMNS on a graft table adds TOP-LEVEL columns " +
          s"(got nested ${a.fieldNames.mkString(".")})")
      require(a.isNullable,
        s"added column ${a.fieldNames.head} must be nullable — " +
          "carried files null-backfill it (S29)")
      require(a.position() == null,
        "ADD COLUMNS appends at the end on a graft table (FIRST/" +
          "AFTER would reorder the recorded DDL under carried files)")
      org.apache.spark.sql.types.StructField(a.fieldNames.head,
        a.dataType, nullable = true)
    }
    if (adds.nonEmpty) GraftAlterTable.addColumns(spark, root, adds)
    changes.collect { case r: TableChange.RenameColumn =>
      require(r.fieldNames.length == 1,
        "RENAME COLUMN on a graft table renames TOP-LEVEL columns " +
          s"(got nested ${r.fieldNames.mkString(".")})")
      ManifestStore.renameColumn(spark, root, r.fieldNames.head,
        r.newName)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isTable(root)) false
    else Tables.fsFor(spark, root).delete(new Path(root), true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    // the RENAME TO target arrives as the raw multipart identifier —
    // a catalog-qualified target keeps this catalog's name as its
    // first namespace component; strip it so `RENAME TO cat.db.t2`
    // and `RENAME TO db.t2` address the same directory
    def normalized(i: Identifier): Identifier =
      if (i.namespace.length > 1 && i.namespace.head == catName)
        Identifier.of(i.namespace.drop(1), i.name)
      else i
    val from = rootOf(normalized(oldIdent))
    val to = rootOf(normalized(newIdent))
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    val fs = Tables.fsFor(spark, from)
    if (!fs.rename(new Path(from), new Path(to)))
      throw new IllegalStateException(
        s"cannot rename $from -> $to")
  }

  // ---- namespaces (directories) ----

  override def listNamespaces(): Array[Array[String]] = {
    val fs = Tables.fsFor(spark, warehouse)
    if (!fs.exists(new Path(warehouse))) Array.empty
    else fs.listStatus(new Path(warehouse)).toSeq
      .filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val fs = Tables.fsFor(spark, dir)
    if (!fs.exists(new Path(dir)))
      throw new NoSuchNamespaceException(namespace)
    fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && !isTable(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    Tables.fsFor(spark, dir).exists(new Path(dir))
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val m = new util.HashMap[String, String]()
    m.put(SupportsNamespaces.PROP_LOCATION,
      (warehouse +: namespace.toSeq).mkString("/"))
    m
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String])
      : Unit = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    Tables.fsFor(spark, dir).mkdirs(new Path(dir))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: org.apache.spark.sql.connector
                                .catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are directories; nothing to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = (warehouse +: namespace.toSeq).mkString("/")
    val fs = Tables.fsFor(spark, dir)
    if (!fs.exists(new Path(dir))) false
    else {
      if (!cascade && fs.listStatus(new Path(dir)).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(new Path(dir), true)
    }
  }
}

/** The catalog's table handle: a METADATA shell — name, schema (the
  * pinned/serving generation's recorded DDL), identity partitioning —
  * plus the `(root, pinned gen)` pair [[GraftCatalogRule]] needs to
  * swap in the real DSv1 stats-pruned relation at resolution time.
  * `newScanBuilder` exists only to refuse loudly when the rule never
  * ran (extensions not registered).
  */
private[graft] class GraftTable(fullName: String, val root: String,
                                val pinnedGen: Option[Long])
    extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = fullName

  override lazy val schema: StructType = {
    val isManifest = Tables.fsFor(spark, root).exists(
      new Path(s"$root/_manifests"))
    if (isManifest) {
      val g = pinnedGen.orElse(ManifestStore.currentGen(spark, root))
        .getOrElse(throw new IllegalStateException(
          s"no published manifest table at $root"))
      StructType.fromDDL(
        ManifestStore.manifestAt(spark, root, g).schemaDdl)
    } else pinnedGen match {
      case Some(g) => SnapshotStore.readAt(spark, root, g).schema
      case None    => SnapshotStore.readCurrent(spark, root).schema
    }
  }

  override def partitioning(): Array[Transform] = {
    val isManifest = Tables.fsFor(spark, root).exists(
      new Path(s"$root/_manifests"))
    if (!isManifest) Array.empty
    else {
      val g = pinnedGen.orElse(ManifestStore.currentGen(spark, root))
        .getOrElse(return Array.empty)
      ManifestStore
        .partColsOf(ManifestStore.manifestAt(spark, root, g).partCol)
        .map(c => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c)).toArray
    }
  }

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_LOCATION, root)
    pinnedGen.foreach(g => m.put("graft.versionAsOf", g.toString))
    m
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    throw new IllegalStateException(
      s"graft catalog reads plan through the injected resolution " +
        s"rule, which did not run for $fullName — register the " +
        "extensions (spark.sql.extensions=graft.GraftExtensions) " +
        "when building the session")
}
