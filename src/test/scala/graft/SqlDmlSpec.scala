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
      // a BARE column existing in BOTH relations is ambiguous — the
      // SQL rule; qualify it (t./s.)
      val e1 = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO dml_t t USING dml_s s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET o_orderpriority = o_orderstatus")
      }
      assert(e1.getMessage.contains("ambiguous"))
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

  test("GENERAL MERGE: conditional WHEN clauses, column-list " +
      "assignments, conditional INSERT, and NOT MATCHED BY SOURCE " +
      "DELETE — one generation commit, untouched partitions " +
      "byte-identical, result row-exact vs an independent build") {
    val dir = tmp("sqlgmerge")
    try {
      val root = dir.toString + "/orders"
      val orders = Tables.table(spark, sf, "orders")
        .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      ManifestStore.publish(spark, orders, root, "o_year")
      val before = fileState(root, 1L)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW gm_t USING " +
        s"`graft-snapshot` OPTIONS (path '$root')")
      // a THIN source (not the target's shape): key-sampled rows of
      // 1996/97 to match, negated keys to insert
      // key 0 exists in the testdata and is its own negation — keep
      // the insert keys (negated) provably disjoint from the domain
      val base = orders
        .filter(col("o_year").isin("1996", "1997") &&
          col("o_orderkey") % 97 === 0 && col("o_orderkey") > 0)
      val src = base.select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("newprice"), col("o_year"))
        .unionByName(base.select((-col("o_orderkey")).as("o_orderkey"),
          lit(1000.0).as("newprice"), col("o_year")))
      src.createOrReplaceTempView("gm_src")
      val g = spark.sql(
        "MERGE INTO gm_t t USING gm_src s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED AND t.o_orderstatus = 'F' THEN UPDATE SET " +
          "o_totalprice = s.newprice, o_orderpriority = 'REPRICED' " +
          "WHEN MATCHED THEN DELETE " +
          "WHEN NOT MATCHED AND s.o_orderkey % 2 = 0 THEN INSERT " +
          "(o_orderkey, o_year, o_totalprice) VALUES " +
          "(s.o_orderkey, s.o_year, s.newprice) " +
          "WHEN NOT MATCHED BY SOURCE AND o_year = '1998' AND " +
          "o_orderkey % 10 = 0 THEN DELETE").head().getLong(0)
      assert(g == 2L, "the whole CDC apply must be ONE generation")

      // independent expected build (plain DataFrame algebra)
      val withNew = orders.join(
        src.filter(col("o_orderkey") > 0)
          .select(col("o_orderkey"), col("newprice")),
        Seq("o_orderkey"), "left")
      val matchedF = col("newprice").isNotNull
      val expectedKept = withNew
        .filter(!(matchedF && col("o_orderstatus") =!= "F"))
        .filter(!(col("newprice").isNull && col("o_year") === "1998" &&
          col("o_orderkey") % 10 === 0))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          when(matchedF, col("newprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderdate"),
          when(matchedF, lit("REPRICED"))
            .otherwise(col("o_orderpriority")).as("o_orderpriority"),
          col("o_year"))
      val expectedIns = src
        .filter(col("o_orderkey") < 0 && col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          col("newprice").as("o_totalprice"),
          lit(null).cast(orders.schema("o_orderdate").dataType)
            .as("o_orderdate"),
          lit(null).cast("string").as("o_orderpriority"),
          col("o_year"))
      val expected = expectedKept.unionByName(expectedIns)
      val actual = ManifestStore.readCurrent(spark, root)
      assert(actual.count() == expected.count())
      assert(actual.exceptAll(expected).isEmpty &&
        expected.exceptAll(actual).isEmpty,
        "merge result must be row-exact vs the independent build")

      // partitions outside {1996, 1997, 1998} never rewrite
      val after = fileState(root, 2L)
      val untouched = ManifestStore.manifestAt(spark, root, 2L)
        .entries.filterNot(e =>
          Set("1996", "1997", "1998").contains(e.partition))
        .map(_.relPath)
      assert(untouched.nonEmpty && untouched.forall(p =>
        before.get(p).contains(after(p))),
        "partitions no clause touches must carry byte-identical")
      assert(graft.operators.IndexAudit
        .isManifestTableHealthy(spark, root))

      // SQL cardinality rule: duplicate matching source keys refuse
      src.unionByName(src).createOrReplaceTempView("gm_dup")
      val e = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO gm_t t USING gm_dup s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET o_totalprice = s.newprice")
      }
      assert(e.getMessage.contains("cardinality"))
      // BY SOURCE clauses cannot reference SOURCE columns (no
      // matched source row) — refused typed at parse time
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO gm_t t USING gm_src s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET " +
          "o_totalprice = s.newprice")
      }
      assert(e2.getMessage.contains("BY SOURCE"))
      Seq("gm_t", "gm_src", "gm_dup")
        .foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(dir)
  }

  test("INSERT INTO a graft view: positional append rewrites only " +
      "the landed partitions; a column list NULL-fills; OVERWRITE " +
      "is the full replace; snapshot layout refuses") {
    val dir = tmp("sqlinsert")
    try {
      val root = dir.toString + "/orders"
      val orders = Tables.table(spark, sf, "orders")
        .withColumn("o_year", date_format(col("o_orderdate"), "yyyy"))
      ManifestStore.publish(spark, orders, root, "o_year")
      val n0 = orders.count()
      val before = fileState(root, 1L)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW ins_t USING " +
        s"`graft-snapshot` OPTIONS (path '$root')")
      orders.filter(col("o_year") === "1996").limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 500000000L)
        .withColumn("o_orderpriority", lit("NEW"))
        .createOrReplaceTempView("ins_src")

      // positional full-width INSERT ... SELECT
      val g = spark.sql("INSERT INTO ins_t SELECT * FROM ins_src")
        .head().getLong(0)
      assert(g == 2L)
      val cur = ManifestStore.readCurrent(spark, root)
      assert(cur.count() == n0 + 50)
      assert(cur.filter(col("o_orderpriority") === "NEW")
        .count() == 50)
      // existing 1996 rows still there (append, not replace)
      assert(cur.filter(col("o_year") === "1996" &&
        col("o_orderpriority") =!= "NEW").count() ==
        orders.filter(col("o_year") === "1996").count())
      val after = fileState(root, 2L)
      val untouched = ManifestStore.manifestAt(spark, root, 2L)
        .entries.filter(_.partition != "1996").map(_.relPath)
      assert(untouched.nonEmpty && untouched.forall(p =>
        before.get(p).contains(after(p))),
        "INSERT must rewrite only the partitions it lands rows in")

      // column list: unnamed columns land NULL
      val g2 = spark.sql("INSERT INTO ins_t (o_orderkey, o_year) " +
        "SELECT o_orderkey + 600000000, o_year FROM ins_src")
        .head().getLong(0)
      assert(g2 == 3L)
      val cur2 = ManifestStore.readCurrent(spark, root)
      assert(cur2.filter(col("o_orderkey") > 600000000L)
        .filter(col("o_totalprice").isNotNull).count() == 0L)
      assert(cur2.count() == n0 + 100)

      // INSERT OVERWRITE: the honest full replace
      val g3 = spark.sql("INSERT OVERWRITE ins_t " +
        "SELECT * FROM ins_src").head().getLong(0)
      assert(g3 == 4L)
      assert(ManifestStore.readCurrent(spark, root).count() == 50)
      // time travel still serves the pre-overwrite state
      assert(ManifestStore.readAt(spark, root, 3L).count() == n0 + 100)
      assert(graft.operators.IndexAudit
        .isManifestTableHealthy(spark, root))

      // width mismatch refuses (positional needs full width)
      val e = intercept[IllegalArgumentException] {
        spark.sql("INSERT INTO ins_t SELECT o_orderkey FROM ins_src")
      }
      assert(e.getMessage.contains("positional"))
      // static PARTITION spec refuses
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("INSERT INTO ins_t PARTITION (o_year='1996') " +
          "SELECT o_orderkey, o_custkey, o_orderstatus, " +
          "o_totalprice, o_orderdate, o_orderpriority FROM ins_src")
      }
      assert(e2.getMessage.contains("PARTITION"))
      // snapshot layout: full-copy generations take no row DML
      val snapRoot = dir.toString + "/snap"
      SnapshotStore.publish(spark,
        Tables.table(spark, sf, "nation"), snapRoot)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW ins_snap USING " +
        s"`graft-snapshot` OPTIONS (path '$snapRoot')")
      val e3 = intercept[IllegalStateException] {
        spark.sql("INSERT INTO ins_snap SELECT * FROM ins_snap")
      }
      assert(e3.getMessage.contains("manifest layout"))
      Seq("ins_t", "ins_src", "ins_snap")
        .foreach(spark.catalog.dropTempView)
      ()
    } finally rmTree(dir)
  }

  test("Scala mergeInto (the Column API surface): srcCol binds " +
      "source columns in matched clauses, SET * excludes partition " +
      "columns, BY SOURCE updates see target rows only") {
    val dir = tmp("scalamerge")
    try {
      val root = dir.toString + "/nation"
      val M = ManifestStore
      val nation = Tables.table(spark, sf, "nation")
      M.publish(spark, nation, root, "n_regionkey")
      // thin source: half the keys, a replacement name
      val src = nation.filter(col("n_nationkey") % 2 === 0)
        .select(col("n_nationkey"),
          concat(lit("NEW-"), col("n_name")).as("newname"))
      val g = M.mergeInto(spark, src, root, Seq("n_nationkey"),
        matched = Seq(
          M.MergeUpdate(
            Some(Seq("n_name" -> M.srcCol("newname"))),
            cond = Some(col("n_regionkey") === 1)),
          M.MergeDelete(cond = Some(col("n_regionkey") === 2))),
        notMatchedBySource = Seq(
          M.MergeUpdate(Some(Seq("n_name" ->
            concat(col("n_name"), lit("-KEPT")))),
            cond = Some(col("n_regionkey") === 3))))
      assert(g == 2L)
      val cur = M.readCurrent(spark, root)
      val matchedKeys = (k: org.apache.spark.sql.Column) => k % 2 === 0
      // matched + region 1 -> renamed from the SOURCE value
      assert(cur.filter(col("n_regionkey") === 1 &&
        matchedKeys(col("n_nationkey")))
        .filter(!col("n_name").startsWith("NEW-")).count() == 0L)
      // matched + region 2 -> deleted
      assert(cur.filter(col("n_regionkey") === 2 &&
        matchedKeys(col("n_nationkey"))).count() == 0L)
      // NOT matched + region 3 -> BY SOURCE update (old target value)
      assert(cur.filter(col("n_regionkey") === 3 &&
        col("n_nationkey") % 2 === 1)
        .filter(!col("n_name").endsWith("-KEPT")).count() == 0L)
      // everything else carries
      assert(cur.filter(col("n_regionkey") === 0)
        .count() == nation.filter(col("n_regionkey") === 0).count())
      // refusals: partition column unassignable; unknown srcCol
      // binding fails at execution (late binding, loud)
      val e = intercept[IllegalArgumentException] {
        M.mergeInto(spark, src, root, Seq("n_nationkey"),
          matched = Seq(M.MergeUpdate(
            Some(Seq("n_regionkey" -> M.srcCol("newname"))))))
      }
      assert(e.getMessage.contains("partition column"))
      ()
    } finally rmTree(dir)
  }

  test("mergeInto with ONLY insert / BY SOURCE clauses and a source " +
      "carrying DUPLICATE keys that match existing target rows: the " +
      "matched rows carry through exactly once (no join-fanout " +
      "duplication), unmatched duplicates insert per SQL") {
    val dir = tmp("mergedup")
    try {
      import spark.implicits._
      val M = ManifestStore
      // ---- insert-only merge ----
      val root = dir.toString + "/t"
      M.publish(spark,
        Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
          .toDF("k", "v", "p"), root, "p")
      // key 1 matches the target THREE times; key 9 is new twice —
      // SQL: matched copies do nothing, each unmatched row inserts
      val src = Seq((1L, "x", "a"), (1L, "y", "a"), (1L, "z", "a"),
        (9L, "n1", "b"), (9L, "n2", "b")).toDF("k", "v", "p")
      M.mergeInto(spark, src, root, Seq("k"),
        notMatched = Seq(M.MergeInsert(None)))
      val cur = M.readCurrent(spark, root)
      assert(cur.filter(col("k") === 1L).count() == 1L,
        "duplicate-key source fanned out a matched target row")
      assert(cur.filter(col("k") === 9L).count() == 2L,
        "each unmatched source duplicate inserts (SQL semantics)")
      assert(cur.count() == 5L)
      // ---- BY-SOURCE-only merge, duplicate matching keys ----
      val root2 = dir.toString + "/t2"
      M.publish(spark,
        Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
          .toDF("k", "v", "p"), root2, "p")
      M.mergeInto(spark,
        Seq((1L, "x", "a"), (1L, "y", "a")).toDF("k", "v", "p"),
        root2, Seq("k"),
        notMatchedBySource = Seq(M.MergeUpdate(
          Some(Seq("v" -> concat(col("v"), lit("-STALE")))))))
      val cur2 = M.readCurrent(spark, root2)
      assert(cur2.filter(col("k") === 1L).count() == 1L,
        "duplicate-key source fanned out a carried target row")
      assert(cur2.filter(col("k") === 1L).head().getString(1) == "one")
      assert(cur2.filter(col("v").endsWith("-STALE")).count() == 2L)
      // with a MATCHED clause present the duplicates stay refused
      val e = intercept[IllegalArgumentException] {
        M.mergeInto(spark,
          Seq((1L, "x", "a"), (1L, "y", "a")).toDF("k", "v", "p"),
          root2, Seq("k"),
          matched = Seq(M.MergeUpdate(None)))
      }
      assert(e.getMessage.contains("cardinality"))
      ()
    } finally rmTree(dir)
  }

  test("SET * / INSERT * expansion resolves source columns CASE-" +
      "INSENSITIVELY (Spark's default resolution): a source column " +
      "differing only in case assigns, not NULL-fills") {
    val dir = tmp("mergecase")
    try {
      import spark.implicits._
      val M = ManifestStore
      val root = dir.toString + "/t"
      M.publish(spark,
        Seq((1L, "one", "a"), (2L, "two", "a")).toDF("k", "v", "p"),
        root, "p")
      // source spells the value column "V" — Spark resolves it to v
      val src = Seq((2L, "TWO", "a"), (7L, "SEVEN", "a"))
        .toDF("K", "V", "p")
      M.mergeInto(spark, src, root, Seq("k"),
        matched = Seq(M.MergeUpdate(None)),       // SET *
        notMatched = Seq(M.MergeInsert(None)))        // INSERT *
      val cur = M.readCurrent(spark, root).orderBy("k").collect()
      assert(cur.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "one"), (2L, "TWO"), (7L, "SEVEN")),
        "case-different source columns must assign on SET */INSERT *")
      ()
    } finally rmTree(dir)
  }

  test("SQL maintenance verbs: OPTIMIZE [SORT BY] / VACUUM / FSCK " +
      "[REPAIR] TABLE / DESCRIBE HISTORY / SHOW PARTITIONS run the " +
      "store maintenance ops and return generations / reclaim " +
      "counts / findings; non-graft targets pass through") {
    val dir = tmp("sqlmaint")
    try {
      import spark.implicits._
      val root = dir.toString + "/t"
      val M = ManifestStore
      // several small files per partition so OPTIMIZE has offenders
      val df = (0L until 200L).map(k => (k, (k % 2).toString))
        .toDF("k", "p").repartition(6)
      M.publish(spark, df, root, "p", coalescePartitions = false,
        keep = 4)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW maint_t USING " +
        s"`graft-snapshot` OPTIONS (path '$root')")
      // SHOW PARTITIONS: manifest inventory, no data read
      val parts = spark.sql("SHOW PARTITIONS maint_t").collect()
      assert(parts.map(_.getString(0)).sorted.toSeq == Seq("0", "1"))
      assert(parts.forall(_.getLong(1) > 1L),
        "the fixture needs multi-file partitions")
      // OPTIMIZE: compaction commits a generation, reports count
      val opt = spark.sql("OPTIMIZE maint_t").head()
      assert(opt.getLong(0) == 2L && opt.getLong(1) == 2L)
      assert(M.readCurrent(spark, root).count() == 200L)
      assert(spark.sql("SHOW PARTITIONS maint_t").collect()
        .forall(_.getLong(1) == 1L))
      // OPTIMIZE ... SORT BY: range clustering
      val opt2 = spark.sql("OPTIMIZE maint_t SORT BY (k)").head()
      assert(opt2.getLong(0) == 3L)
      // DESCRIBE HISTORY: newest first, fsck statuses
      val hist = spark.sql("DESCRIBE HISTORY maint_t").collect()
      assert(hist.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
      assert(hist.head.getString(2) == "serving")
      assert(hist.last.getString(2) != "serving")
      // VACUUM: a dropped branch's private manifests + staged files
      // reclaim on the explicit prune (keep=4 retains all main gens)
      M.branch(spark, root, "wip")
      M.publishToBranch(spark,
        Seq((9999L, "0")).toDF("k", "p"), root, "wip")
      M.dropRef(spark, root, "wip")
      val vac = spark.sql("VACUUM maint_t").head()
      assert(vac.getLong(1) >= 1L, s"reclaimed_files: $vac")
      assert(vac.getLong(2) == 3L, s"retained_generations: $vac")
      // FSCK TABLE: healthy findings
      val fsck = spark.sql("FSCK TABLE maint_t").collect()
      assert(fsck.nonEmpty && fsck.forall(_.getBoolean(3)),
        s"fsck must be healthy, got ${fsck.mkString(";")}")
      // FSCK REPAIR on damage: plant a residue manifest, repair
      // reclaims it
      val fs = Tables.fsFor(spark, root)
      val residue = new org.apache.hadoop.fs.Path(
        s"$root/_manifests/4")
      val out = fs.create(residue, true)
      try out.write(M.serializeManifest(
        M.manifestAt(spark, root, 3L)))
      finally out.close()
      val rep = spark.sql("FSCK REPAIR TABLE maint_t").collect()
      assert(rep.exists(r => r.getString(2).contains("residue")),
        s"repair must reclaim the planted residue, got " +
          rep.mkString(";"))
      assert(!fs.exists(residue))
      // non-graft targets: DESCRIBE HISTORY falls through to Spark
      spark.range(3).createOrReplaceTempView("history")
      val plain = spark.sql("DESCRIBE HISTORY id")
      assert(plain.columns.exists(_.toLowerCase.contains("col")) ||
        plain.columns.exists(_.toLowerCase.contains("name")),
        "a non-graft DESCRIBE must reach Spark's own describe")
      spark.catalog.dropTempView("history")
      spark.catalog.dropTempView("maint_t")
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
