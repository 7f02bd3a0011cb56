package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}

/** The SQL/DataFrameReader surface of the pointer-served tables —
  * S19's `readCurrent`/`readAt` (and the S20 manifest table's)
  * reachable without touching the Scala API, the `VERSION AS OF`
  * ergonomics restated as a standard data source:
  *
  * {{{
  *   -- pure SQL: a temp view over a served or time-traveled gen
  *   CREATE TEMPORARY VIEW fact USING `graft-snapshot`
  *     OPTIONS (path '/warehouse/gold/fact_sales', versionAsOf '7');
  *   SELECT ... FROM fact;
  *
  *   // DataFrameReader
  *   spark.read.format("graft-snapshot")
  *     .option("versionAsOf", 7).load(root)
  * }}}
  *
  * Options: `path` (the table root), `versionAsOf` (a generation —
  * omit for the serving one). The LAYOUT is probed from the root:
  * a `_manifests/` tree means the S20 manifest table, otherwise the
  * S19 snapshot table — one source name for the whole pointer
  * family.
  *
  * The relation handed back is the resolved generation's REAL
  * file-source relation ([[org.apache.spark.sql.GraftSqlBridge
  * .fileRelationOf]]), so SQL over a snapshot keeps native parquet
  * pushdown and pruning — this provider adds exactly one pointer
  * read of planning-time cost and nothing at scan time. Resolution
  * happens at VIEW CREATION (DSv1 relations are resolved once): a
  * view pinned with `versionAsOf` is immutable by construction; a
  * view created without it serves the generation that was current at
  * creation — re-create (or re-`load`) to follow the pointer, which
  * is the same read-your-resolution contract every
  * [[SnapshotStore.readCurrent]] caller already has. Refusals are
  * the typed ones the Scala API throws ([[graft.SnapshotUnavailable]]
  * for a residue or pruned gen).
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot needs a path option (the table root)"))
    val gen = parameters.get("versionAsOf").map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf must be a generation number, got '$v'"))
    }
    val isManifest = Tables.fsFor(spark, root).exists(
      new org.apache.hadoop.fs.Path(s"$root/_manifests"))
    val df = (isManifest, gen) match {
      case (true, Some(g))  => ManifestStore.readAt(spark, root, g)
      case (true, None)     => ManifestStore.readCurrent(spark, root)
      case (false, Some(g)) => SnapshotStore.readAt(spark, root, g)
      case (false, None)    => SnapshotStore.readCurrent(spark, root)
    }
    org.apache.spark.sql.GraftSqlBridge.fileRelationOf(df)
  }
}
