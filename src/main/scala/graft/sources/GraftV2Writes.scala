package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The DataFrame writer-V2 surface (`df.writeTo("graft.ns.t")`) and
  * SQL CTAS on the catalog — plan-level rewrites, the same
  * architecture as the S28/S33 statement routing: the analyzer's
  * injected rule ([[GraftCatalogRule]]) replaces Spark's V2 write
  * plans over a [[GraftTable]] with these commands BEFORE the
  * capability check runs, and each command drives the battle-tested
  * store op — `.append()` → [[ManifestStore.append]] (partition-
  * scoped, BY NAME), `.overwritePartitions()` →
  * [[ManifestStore.publish]] (dynamic-partition semantics are
  * EXACTLY the manifest publish contract: landed partitions replace,
  * everything else carries byte-identical), `.overwrite(lit(true))` /
  * `.truncate()` → a `replaceAll` rebuild. A DSv2 BatchWrite
  * re-implementation would have to re-create the staging-lock
  * discipline, the CAS, disjoint rebase, stats recording, and the
  * list-layout carry — the rewrite reuses all of it.
  */
private[graft] object GraftV2Writes

/** `df.writeTo(t).append()` — SQL INSERT INTO semantics. */
case class GraftV2AppendCommand(tableName: String, root: String,
                                query: GraftSqlDml.PlanBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftSqlBridge.dfOf(spark, query.plan)
    Seq(Row(ManifestStore.append(spark, df, root)))
  }
}

/** `df.writeTo(t).overwritePartitions()` — dynamic partition
  * overwrite: exactly the manifest publish contract (landed
  * partitions replace, others carry).
  */
case class GraftV2OverwritePartitionsCommand(tableName: String,
                                             root: String,
                                             query: GraftSqlDml.PlanBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val df = org.apache.spark.sql.GraftSqlBridge.dfOf(spark, query.plan)
    val gen = ManifestStore.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root"))
    val m = ManifestStore.manifestAt(spark, root, gen)
    val schema = StructType.fromDDL(m.schemaDdl)
    val missing = schema.fieldNames.filterNot(n =>
      df.columns.exists(_.equalsIgnoreCase(n)))
    val unknown = df.columns.filterNot(n =>
      schema.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(missing.isEmpty && unknown.isEmpty,
      s"overwritePartitions must carry exactly the table's columns; " +
        s"missing [${missing.mkString(",")}], unknown " +
        s"[${unknown.mkString(",")}]")
    val aligned = df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    Seq(Row(ManifestStore.publish(spark, aligned, root, m.partCol)))
  }
}

/** `df.writeTo(t).overwrite(lit(true))` / `.truncate().append()`'s
  * whole-table form — the replaceAll rebuild. Arbitrary overwrite
  * conditions refuse typed (the honest remedies are named).
  */
case class GraftV2TruncateOverwriteCommand(tableName: String,
                                           root: String,
                                           query: GraftSqlDml.PlanBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("gen", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val df = org.apache.spark.sql.GraftSqlBridge.dfOf(spark, query.plan)
    val gen = ManifestStore.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root"))
    val m = ManifestStore.manifestAt(spark, root, gen)
    val schema = StructType.fromDDL(m.schemaDdl)
    val aligned = df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    Seq(Row(ManifestStore.publish(spark, aligned, root, m.partCol,
      replaceAll = true)))
  }
}

/** `CREATE TABLE graft.ns.t PARTITIONED BY (p) AS SELECT ...` — ONE
  * generation: the query's rows publish directly as generation 1
  * (replaceAll bootstrap), so the pointer appears only when the data
  * is ready — a crashed CTAS leaves no half-table (strictly better
  * than CREATE-then-INSERT's empty-gen window).
  */
case class GraftCtasCommand(catalog: GraftCatalog, ident: Identifier,
                            partitioning: Seq[Transform],
                            query: GraftSqlDml.PlanBox,
                            ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val root = catalog.rootFor(ident)
    if (Tables.fsFor(spark, root).exists(
        new org.apache.hadoop.fs.Path(s"$root/_current"))) {
      if (ignoreIfExists) return Seq.empty
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val partCols = partitioning.map {
      case t: Transform if t.name == "identity" =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new IllegalArgumentException(
        s"graft tables partition on column VALUES only " +
          s"(PARTITIONED BY (col)); got transform $other")
    }
    require(partCols.nonEmpty,
      "CREATE TABLE ... AS SELECT on a graft table needs " +
        "PARTITIONED BY (at least one column) — partition scope is " +
        "what makes its DML/merge rewrites cheap")
    val df = org.apache.spark.sql.GraftSqlBridge.dfOf(spark, query.plan)
    partCols.foreach(c => require(
      df.columns.exists(_.equalsIgnoreCase(c)),
      s"partition column $c not in ${df.columns.mkString(",")}"))
    ManifestStore.publish(spark, df, root, partCols.mkString(","),
      replaceAll = true)
    Seq.empty
  }
}

/** `ALTER TABLE graft.ns.t ADD COLUMNS (...)` — the S29 widening
  * publish, METADATA-ONLY: a new generation carrying every prior
  * entry verbatim under the widened recorded DDL; old files serve
  * the new columns null-backfilled (parquet by-name resolution), not
  * one data row moves. Used by [[GraftCatalog.alterTable]].
  */
private[graft] object GraftAlterTable {
  def addColumns(spark: SparkSession, root: String,
                 adds: Seq[StructField]): Unit = {
    val gen = ManifestStore.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root"))
    val m = ManifestStore.manifestAt(spark, root, gen)
    val schema = StructType.fromDDL(m.schemaDdl)
    adds.foreach(f => require(
      !schema.fieldNames.exists(_.equalsIgnoreCase(f.name)),
      s"column ${f.name} already exists in " +
        schema.fieldNames.mkString(",")))
    val widened = StructType(schema.fields ++ adds)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), widened)
    ManifestStore.publish(spark, empty, root, m.partCol)
    ()
  }
}
