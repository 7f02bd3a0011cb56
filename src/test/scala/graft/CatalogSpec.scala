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
      "non-identity transforms, ALTER, missing tables") {
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
      val e3 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN w STRING")
      }
      assert(e3.getMessage.contains("publish"))
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
}
