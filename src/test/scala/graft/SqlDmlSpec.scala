package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ManifestStore, SnapshotStore, Tables}

/** The SQL DML surface: DELETE/UPDATE/MERGE statements on
  * `graft-snapshot` views route through the injected parser
  * ([[graft.sources.GraftSqlParser]]) to the manifest-table DML ops,
  * with the partition-scoped rewrite contract intact (untouched files
  * byte-identical) — and everything that is NOT a graft table passes
  * through to Spark untouched.
  */
class SqlDmlSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(tag: String): java.io.File =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile

  private def fileState(root: String, gen: Long): Map[String, Long] = {
    val fs = Tables.fsFor(spark, root)
    ManifestStore.manifestAt(spark, root, gen).entries.map { e =>
      e.relPath -> fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$root/${e.relPath}"))
        .getModificationTime
    }.toMap
  }

  test("DELETE FROM / UPDATE / MERGE INTO a graft view run the " +
      "store DML ops: statements return the committed gen, only " +
      "affected partitions rewrite, results match the Column API") {
    val dir = tmp("sqldml")
    try {
      val root = dir.toString + "/orders"
      val orders = Tables.table(spark, sf, "orders")
        .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      ManifestStore.publish(spark, orders, root, "o_year")
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_orders USING " +
        s"`graft-snapshot` OPTIONS (path '$root')")
      val before = fileState(root, 1L)

      // DELETE — qualified refs strip (dml_orders.o_year binds)
      val delGen = spark.sql("DELETE FROM dml_orders WHERE " +
        "dml_orders.o_year = '1996' AND o_orderstatus = 'F'")
        .head().getLong(0)
      assert(delGen == 2L)
      val after = fileState(root, 2L)
      val untouched = ManifestStore.manifestAt(spark, root, 2L)
        .entries.filter(_.partition != "1996").map(_.relPath)
      assert(untouched.nonEmpty && untouched.forall(p =>
        before.get(p).contains(after(p))),
        "untouched partitions must carry byte-identical")
      val expectDel = orders.filter(!(col("o_year") === "1996" &&
        col("o_orderstatus") === "F"))
      assert(ManifestStore.readCurrent(spark, root).count() ==
        expectDel.count())

      // UPDATE — RHS evaluates against OLD values, WHERE optional
      val updGen = spark.sql("UPDATE dml_orders SET " +
        "o_orderpriority = concat('X-', o_orderpriority) " +
        "WHERE o_year = '1997'").head().getLong(0)
      assert(updGen == 3L)
      val cur = ManifestStore.readCurrent(spark, root)
      assert(cur.filter(col("o_year") === "1997")
        .filter(!col("o_orderpriority").startsWith("X-")).count() == 0L)
      assert(cur.filter(col("o_year") =!= "1997")
        .filter(col("o_orderpriority").startsWith("X-")).count() == 0L)

      // MERGE — canonical upsert routes to mergePartitions
      val batch = ManifestStore.readCurrent(spark, root)
        .filter(col("o_year") === "1998").limit(10)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(expectDel.filter(col("o_year") === "1998")
          .limit(5).withColumn("o_orderkey",
            col("o_orderkey") + 900000000L))
      batch.createOrReplaceTempView("dml_src")
      val preMergeRows = cur.count()
      val mGen = spark.sql("MERGE INTO dml_orders t USING dml_src s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").head().getLong(0)
      assert(mGen == 4L)
      val merged = ManifestStore.readCurrent(spark, root)
      assert(merged.count() == preMergeRows + 5)
      assert(merged.filter(col("o_orderstatus") === "M").count() >= 10)
      spark.catalog.dropTempView("dml_src")
      spark.catalog.dropTempView("dml_orders")
      ()
    } finally rmTree(dir)
  }

  test("refusals: non-canonical MERGE refuses with the supported " +
      "form named; DML on a snapshot-layout view refuses typed; " +
      "non-graft targets pass through to Spark's own handling") {
    val dir = tmp("sqldmlref")
    try {
      val root = dir.toString + "/orders"
      val snapRoot = dir.toString + "/nation"
      val orders = Tables.table(spark, sf, "orders")
        .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      ManifestStore.publish(spark, orders, root, "o_year")
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_t USING " +
        s"`graft-snapshot` OPTIONS (path '$root')")
      orders.limit(3).createOrReplaceTempView("dml_s")
      // a column-list MATCHED action is not the canonical upsert
      val e1 = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO dml_t t USING dml_s s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET o_orderstatus = s.o_orderstatus")
      }
      assert(e1.getMessage.contains("canonical upsert"))
      // a non-equi ON clause refuses too
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO dml_t t USING dml_s s " +
          "ON t.o_orderkey < s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(e2.getMessage.contains("same-name column equalities"))
      // snapshot layout: full-copy generations take no row-level DML
      SnapshotStore.publish(spark,
        Tables.table(spark, sf, "nation"), snapRoot)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_snap USING " +
        s"`graft-snapshot` OPTIONS (path '$snapRoot')")
      val e3 = intercept[IllegalStateException] {
        spark.sql("DELETE FROM dml_snap WHERE n_regionkey = 1")
      }
      assert(e3.getMessage.contains("manifest layout"))
      // a plain temp view is NOT intercepted: Spark's own refusal
      // (DELETE is v2-table territory there), not a graft message
      orders.limit(3).createOrReplaceTempView("dml_plain")
      val e4 = intercept[Exception] {
        spark.sql("DELETE FROM dml_plain WHERE o_orderkey = 1")
      }
      assert(!e4.getMessage.contains("graft"),
        s"the non-graft target must reach Spark's own handler, got $e4")
      Seq("dml_t", "dml_s", "dml_snap", "dml_plain")
        .foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(dir)
  }

  test("DML through a PINNED view refuses typed (versionAsOf, " +
      "timestampAsOf, ref): statements apply to the serving " +
      "generation, which a pinned view does not read") {
    val dir = tmp("sqldmlpin")
    try {
      val root = dir.toString + "/orders"
      val orders = Tables.table(spark, sf, "orders")
        .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      ManifestStore.publish(spark, orders, root, "o_year")
      ManifestStore.publish(spark,
        orders.filter(col("o_year") === "1996")
          .withColumn("o_orderstatus", lit("Z")), root, "o_year")
      ManifestStore.tag(spark, root, "v1", Some(1L))
      val pins = Seq(
        s"versionAsOf '1'",
        "ref 'v1'")
      pins.foreach { pin =>
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_pinned " +
          s"USING `graft-snapshot` OPTIONS (path '$root', $pin)")
        val e = intercept[IllegalStateException] {
          spark.sql("DELETE FROM dml_pinned WHERE o_year = '1996'")
        }
        assert(e.getMessage.contains("PINNED"),
          s"pin [$pin] must refuse typed, got $e")
      }
      // the serving state is untouched by the refused statements
      assert(ManifestStore.currentGen(spark, root).contains(2L))
      // an UNPINNED view of the same table still takes DML
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW dml_unpinned " +
        s"USING `graft-snapshot` OPTIONS (path '$root')")
      val g = spark.sql("DELETE FROM dml_unpinned WHERE " +
        "o_orderstatus = 'Z' AND o_orderkey % 2 = 0")
        .head().getLong(0)
      assert(g == 3L)
      Seq("dml_pinned", "dml_unpinned")
        .foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(dir)
  }

  test("a foreign parquet table whose PATH contains the graft " +
      "directory grammar is NOT hijacked: no pointer marker, no " +
      "reroute — Spark's own DML handling applies") {
    val dir = tmp("sqldmlforeign")
    try {
      // a path that merely contains /_writes/ — no _current pointer
      val foreign = dir.toString + "/x/_writes/1/data"
      Tables.table(spark, sf, "nation").write.parquet(foreign)
      spark.read.parquet(foreign)
        .createOrReplaceTempView("dml_foreign")
      val e = intercept[Exception] {
        spark.sql("DELETE FROM dml_foreign WHERE n_regionkey = 1")
      }
      assert(!e.getMessage.contains("graft"),
        s"foreign table must reach Spark's own handler, got $e")
      spark.catalog.dropTempView("dml_foreign")
      ()
    } finally rmTree(dir)
  }
}
