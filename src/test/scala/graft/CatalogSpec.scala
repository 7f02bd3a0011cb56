package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ManifestStore, Tables}

/** The DSv2 catalog surface ([[graft.sources.GraftCatalog]] +
  * [[graft.sources.GraftCatalogRule]]): `catalog.ns.table`
  * identifiers replace temp-view ceremony — CREATE/INSERT/SELECT with
  * native `VERSION AS OF` / `TIMESTAMP AS OF`, DML through the same
  * parser routes, reads on the stats-pruned DSv1 relation.
  */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshCatalog(tag: String): (String, String) = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft-$tag").toString
    val cat = "c" + tmp.replaceAll("[^0-9a-zA-Z]", "").takeRight(10)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmp)
    (cat, tmp)
  }

  test("CREATE TABLE / INSERT INTO / SELECT / VERSION AS OF / " +
      "TIMESTAMP AS OF / DML — everything through spark.sql on " +
      "catalog identifiers, no temp views") {
    val (cat, tmp) = freshCatalog("cat")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
        .exists(_.getString(0) == "db"))
      spark.sql(s"CREATE TABLE $cat.db.nation (" +
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT) " +
        "PARTITIONED BY (n_regionkey)")
      assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
        .exists(_.getString(1) == "nation"))
      // a fresh table SELECTs empty with the declared schema
      val empty = spark.sql(s"SELECT * FROM $cat.db.nation")
      assert(empty.columns.toSeq ==
        Seq("n_nationkey", "n_name", "n_regionkey"))
      assert(empty.count() == 0L)

      val nation = Tables.table(spark, sf, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      nation.createOrReplaceTempView("cat_nation_src")
      val g1 = spark.sql(s"INSERT INTO $cat.db.nation " +
        "SELECT * FROM cat_nation_src").head().getLong(0)
      assert(g1 == 2L)
      assert(spark.sql(s"SELECT * FROM $cat.db.nation").count() ==
        nation.count())

      // DML on the catalog identifier (no view anywhere)
      val g2 = spark.sql(s"UPDATE $cat.db.nation SET " +
        "n_name = upper(n_name) WHERE n_regionkey = 1")
        .head().getLong(0)
      assert(g2 == 3L)
      val g3 = spark.sql(s"DELETE FROM $cat.db.nation " +
        "WHERE n_regionkey = 0").head().getLong(0)
      assert(g3 == 4L)
      val cur = spark.sql(s"SELECT * FROM $cat.db.nation")
      assert(cur.filter(col("n_regionkey") === 0).count() == 0L)
      assert(cur.filter(col("n_regionkey") === 1)
        .filter(col("n_name") =!= upper(col("n_name"))).count() == 0L)

      // native time travel: by generation and by timestamp
      assert(spark.sql(
        s"SELECT * FROM $cat.db.nation VERSION AS OF 2").count() ==
        nation.count())
      assert(spark.sql(s"SELECT * FROM $cat.db.nation " +
        "TIMESTAMP AS OF '2050-01-01'").count() == cur.count())
      // the read plans through the REAL file relation (pushdown
      // surface), not a wrapper scan
      val plan = spark.sql(s"SELECT n_name FROM $cat.db.nation " +
        "WHERE n_regionkey = 2").queryExecution.executedPlan.toString
      assert(plan.contains("FileScan") || plan.contains("Scan parquet"),
        s"catalog reads must plan a native file scan, got:\n$plan")

      // MERGE through the catalog identifier
      nation.limit(5).withColumn("n_name", lit("MERGED"))
        .createOrReplaceTempView("cat_merge_src")
      val g4 = spark.sql(s"MERGE INTO $cat.db.nation t " +
        "USING cat_merge_src s ON t.n_nationkey = s.n_nationkey " +
        "WHEN MATCHED THEN UPDATE SET n_name = s.n_name")
        .head().getLong(0)
      assert(g4 == 5L)
      val nBeforeRename = cur.count()

      // rename + drop round-trip
      spark.sql(s"ALTER TABLE $cat.db.nation RENAME TO $cat.db.n2")
      assert(spark.sql(s"SELECT * FROM $cat.db.n2").count() ==
        nBeforeRename)
      spark.sql(s"DROP TABLE $cat.db.n2")
      assert(!spark.sql(s"SHOW TABLES IN $cat.db").collect()
        .exists(_.getString(1) == "n2"))
      Seq("cat_nation_src", "cat_merge_src")
        .foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(new java.io.File(tmp))
  }

  test("catalog refusals: CREATE without PARTITIONED BY, " +
      "non-identity transforms, destructive ALTER, missing tables") {
    val (cat, tmp) = freshCatalog("catref")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      val e1 = intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING)")
      }
      assert(e1.getMessage.contains("PARTITIONED BY"))
      val e2 = intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) " +
          "PARTITIONED BY (bucket(4, k))")
      }
      assert(e2.getMessage.contains("VALUES"))
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v STRING) " +
        "PARTITIONED BY (v)")
      // ADD COLUMNS is now the S29 widening publish (its own spec);
      // the DESTRUCTIVE alters keep refusing with the remedy
      val e3 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN k TYPE STRING")
      }
      assert(e3.getMessage.contains("replaceAll") ||
        e3.getMessage.toLowerCase.contains("not supported"))
      val e4 = intercept[Exception] {
        spark.sql(s"SELECT * FROM $cat.db.missing")
      }
      assert(e4.getMessage.toLowerCase.contains("table"))
      ()
    } finally rmTree(new java.io.File(tmp))
  }

  test("catalog generations survive sessions-worth of statements: " +
      "INSERT twice, time travel across both, history intact") {
    val (cat, tmp) = freshCatalog("cathist")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, y STRING) " +
        "PARTITIONED BY (y)")
      spark.range(5).selectExpr("id AS k", "'a' AS y")
        .createOrReplaceTempView("cat_h1")
      spark.range(5, 8).selectExpr("id AS k", "'b' AS y")
        .createOrReplaceTempView("cat_h2")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM cat_h1")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM cat_h2")
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 8L)
      assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 2")
        .count() == 5L)
      assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 1")
        .count() == 0L)
      assert(graft.operators.IndexAudit.isManifestTableHealthy(spark,
        s"$tmp/db/t"))
      Seq("cat_h1", "cat_h2").foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(new java.io.File(tmp))
  }

  test("CTAS: CREATE TABLE ... PARTITIONED BY ... AS SELECT lands " +
      "the query rows as ONE generation (no empty-gen window); " +
      "IF NOT EXISTS no-ops on an existing table; missing " +
      "PARTITIONED BY refuses") {
    val (cat, tmp) = freshCatalog("catctas")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.range(10)
        .selectExpr("id AS k", "CAST(id % 3 AS STRING) AS y")
        .createOrReplaceTempView("ctas_src")
      spark.sql(s"CREATE TABLE $cat.db.t PARTITIONED BY (y) " +
        "AS SELECT * FROM ctas_src")
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 10L)
      // ONE generation: the rows ARE generation 1
      assert(ManifestStore.currentGen(spark, s"$tmp/db/t")
        .contains(1L))
      // IF NOT EXISTS: existing table survives untouched
      spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.db.t " +
        "PARTITIONED BY (y) AS SELECT * FROM ctas_src WHERE k < 2")
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 10L)
      // without IF NOT EXISTS: typed refusal
      val e1 = intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.t PARTITIONED BY (y) " +
          "AS SELECT * FROM ctas_src")
      }
      assert(e1.getMessage.toLowerCase.contains("exists"))
      // CTAS without PARTITIONED BY refuses with the why
      val e2 = intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.db.t2 AS SELECT * FROM ctas_src")
      }
      assert(e2.getMessage.contains("PARTITIONED BY"))
      spark.catalog.dropTempView("ctas_src")
      ()
    } finally rmTree(new java.io.File(tmp))
  }

  test("ALTER TABLE ADD COLUMNS routes to the S29 widening publish " +
      "(metadata-only: every data file carries byte-identical; old " +
      "rows serve the new column null-backfilled); drop/rename/" +
      "re-type keep refusing") {
    val (cat, tmp) = freshCatalog("catalter")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.range(6)
        .selectExpr("id AS k", "CAST(id % 2 AS STRING) AS y")
        .createOrReplaceTempView("alter_src")
      spark.sql(s"CREATE TABLE $cat.db.t PARTITIONED BY (y) " +
        "AS SELECT * FROM alter_src")
      val root = s"$tmp/db/t"
      val fs = Tables.fsFor(spark, root)
      def mtimes(g: Long) = ManifestStore.manifestAt(spark, root, g)
        .entries.map(e => e.relPath -> fs.getFileStatus(
          new org.apache.hadoop.fs.Path(s"$root/${e.relPath}"))
          .getModificationTime).toMap
      val before = mtimes(1L)
      spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMNS (score DOUBLE)")
      // metadata-only: gen 2 carries gen 1's files byte-identical
      val after = mtimes(2L)
      assert(after == before,
        "a widening ALTER must carry every data file verbatim")
      val cur = spark.sql(s"SELECT * FROM $cat.db.t")
      assert(cur.columns.toSeq == Seq("k", "y", "score"))
      assert(cur.filter(col("score").isNotNull).count() == 0L)
      // the widened column takes writes
      spark.sql(s"UPDATE $cat.db.t SET score = CAST(k AS DOUBLE) " +
        "WHERE y = '0'")
      assert(spark.sql(s"SELECT * FROM $cat.db.t " +
        "WHERE y = '0' AND score IS NULL").count() == 0L)
      // time travel serves the old era under its own schema
      assert(spark.sql(s"SELECT * FROM $cat.db.t VERSION AS OF 1")
        .columns.toSeq == Seq("k", "y"))
      // drops/re-types keep the S29 refusal
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.t DROP COLUMN score")
      }
      assert(e1.getMessage.contains("replaceAll") ||
        e1.getMessage.toLowerCase.contains("not supported"))
      // RENAME COLUMN is the S40 metadata-only name mapping: files
      // byte-identical, old rows serve under the new name
      val preRename = mtimes(
        ManifestStore.currentGen(spark, root).get)
      spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN k TO kk")
      val gR = ManifestStore.currentGen(spark, root).get
      assert(mtimes(gR) == preRename,
        "a RENAME must carry every data file verbatim")
      val renamed = spark.sql(s"SELECT * FROM $cat.db.t")
      assert(renamed.columns.toSeq == Seq("kk", "y", "score"))
      assert(renamed.selectExpr("sum(kk)").head().getLong(0) ==
        (0L until 6L).sum)
      assert(graft.operators.IndexAudit
        .isManifestTableHealthy(spark, root))
      spark.catalog.dropTempView("alter_src")
      ()
    } finally rmTree(new java.io.File(tmp))
  }

  test("writer-V2 surface: df.writeTo(t).append() / " +
      ".overwritePartitions() / .overwrite(lit(true)) land as " +
      "generations with partition byte-identity; arbitrary " +
      "overwrite conditions refuse typed") {
    val (cat, tmp) = freshCatalog("catwrite")
    try {
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, y STRING) " +
        "PARTITIONED BY (y)")
      val root = s"$tmp/db/t"
      val fs = Tables.fsFor(spark, root)
      def mtimes(g: Long) = ManifestStore.manifestAt(spark, root, g)
        .entries.map(e => e.relPath -> fs.getFileStatus(
          new org.apache.hadoop.fs.Path(s"$root/${e.relPath}"))
          .getModificationTime).toMap
      // append: INSERT INTO semantics
      spark.range(6).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS y")
        .writeTo(s"$cat.db.t").append()
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 6L)
      assert(ManifestStore.currentGen(spark, root).contains(2L))
      val before = mtimes(2L)
      // dynamic partition overwrite: only y='0' replaces; y='1'
      // rides byte-identical
      spark.range(100, 102)
        .selectExpr("id AS k", "'0' AS y")
        .writeTo(s"$cat.db.t").overwritePartitions()
      val after = mtimes(3L)
      val carried = ManifestStore.manifestAt(spark, root, 3L).entries
        .filter(_.partition == "1").map(_.relPath)
      assert(carried.nonEmpty && carried.forall(p =>
        before.get(p).contains(after(p))),
        "untouched partitions must carry byte-identical")
      val cur = spark.sql(s"SELECT * FROM $cat.db.t")
      assert(cur.filter(col("y") === "0").count() == 2L)
      assert(cur.filter(col("y") === "1").count() == 3L)
      // whole-table overwrite
      spark.range(4).selectExpr("id AS k", "'z' AS y")
        .writeTo(s"$cat.db.t").overwrite(lit(true))
      assert(spark.sql(s"SELECT * FROM $cat.db.t").count() == 4L)
      assert(ManifestStore.currentGen(spark, root).contains(4L))
      // arbitrary overwrite conditions refuse with the remedies
      val e = intercept[Exception] {
        spark.range(1).selectExpr("id AS k", "'z' AS y")
          .writeTo(s"$cat.db.t").overwrite(col("y") === "z")
      }
      assert(e.getMessage.contains("overwritePartitions"))
      // wrong columns refuse loudly
      val e2 = intercept[Exception] {
        spark.range(1).selectExpr("id AS k", "'z' AS y",
          "id AS extra").writeTo(s"$cat.db.t").append()
      }
      assert(e2.getMessage.toLowerCase.contains("column") ||
        e2.getMessage.contains("schema"))
      assert(graft.operators.IndexAudit
        .isManifestTableHealthy(spark, root))
      ()
    } finally rmTree(new java.io.File(tmp))
  }
}
