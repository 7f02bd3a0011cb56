package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end medallion run — the DAG analog executes bronze → silver
  * → gold on a fresh directory and the gold fact is readable and
  * consistent with its source.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bronze → silver → gold end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val fact = Pipeline.run(spark, sf, out, "2026-08-12")
    assert(fact.count() ==
      graft.sources.Tables.table(spark, sf, "lineitem").count())
    val silverNation = spark.read.parquet(s"$out/silver/nation")
    assert(silverNation.count() == 25)
    assert(silverNation.columns.contains("_processing_date"))
    val dims = spark.read.parquet(s"$out/gold/dim_customer")
    assert(dims.select("id_customer").distinct().count() == dims.count())
  }

  test("corpus DAG: bronze → silver → gold produces a packed training set") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-cpipe").toString
    val gold = Pipeline.runCorpus(spark, sf, out, "2026-08-12")
    // silver: exactly one canonical doc per distinct normalized text
    val tf = graft.functions.TextFunctions
    val distinctNorm = graft.sources.Tables.table(spark, sf, "documents")
      .select(tf.normalizeText(tf.stripMarkup(col("text"))).as("n"))
      .distinct().count()
    val silver = spark.read.parquet(s"$out/silver/documents")
    assert(silver.count() == distinctNorm)
    assert(silver.columns.contains("_processing_date"))
    assert(silver.columns.contains("q"), "quality score carried to gold's input")
    // gold: non-empty packed rows, dense per-shard epoch ranks
    assert(gold.count() > 0)
    val bad = gold.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("epoch_rank")).as("mx"),
        min(col("epoch_rank")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0, "epoch ranks are a dense 1..n per shard")
    assert(gold.columns.contains("_modeling_date"))
  }

  test("dueRuns: cadence grid, catchup semantics, off-grid lastRun") {
    val t = java.time.Instant.parse(_: String)
    val start = t("2026-08-01T00:00:00Z")
    // never ran + 3.5 days elapsed → 4 daily runs (start-inclusive)
    val backfill = Pipeline.dueRuns("@daily", start, None,
      t("2026-08-04T12:00:00Z"))
    assert(backfill == Seq(t("2026-08-01T00:00:00Z"),
      t("2026-08-02T00:00:00Z"), t("2026-08-03T00:00:00Z"),
      t("2026-08-04T00:00:00Z")))
    // catchup=false: skip the backlog, latest due run only
    assert(Pipeline.dueRuns("@daily", start, None,
      t("2026-08-04T12:00:00Z"), catchup = false) ==
      Seq(t("2026-08-04T00:00:00Z")))
    // lastRun on the grid → strictly-after runs only
    assert(Pipeline.dueRuns("@daily", start,
      Some(t("2026-08-03T00:00:00Z")), t("2026-08-04T12:00:00Z")) ==
      Seq(t("2026-08-04T00:00:00Z")))
    // off-grid lastRun (a manual run at noon) rounds up to the next
    // grid point — never re-runs the grid point it already covered
    assert(Pipeline.dueRuns("@daily", start,
      Some(t("2026-08-03T12:00:00Z")), t("2026-08-04T12:00:00Z")) ==
      Seq(t("2026-08-04T00:00:00Z")))
    // nothing due yet → empty either way
    assert(Pipeline.dueRuns("@hourly", start,
      Some(t("2026-08-01T05:00:00Z")), t("2026-08-01T05:59:00Z")).isEmpty)
    assert(Pipeline.dueRuns("@hourly", start,
      Some(t("2026-08-01T05:00:00Z")), t("2026-08-01T05:59:00Z"),
      catchup = false).isEmpty)
    // lastRun predating start never rewinds before start
    assert(Pipeline.dueRuns("@weekly", start,
      Some(t("2026-07-01T00:00:00Z")), t("2026-08-08T00:00:00Z")) ==
      Seq(t("2026-08-01T00:00:00Z"), t("2026-08-08T00:00:00Z")))
    intercept[IllegalArgumentException] {
      Pipeline.dueRuns("@monthly", start, None, t("2026-09-01T00:00:00Z"))
    }
  }

  test("withRetries re-runs a flaky stage, rethrows after exhaustion") {
    var n = 0
    val r = Pipeline.withRetries(3) { n += 1; if (n < 3) sys.error("boom"); n }
    assert(r == 3 && n == 3)
    var m = 0
    intercept[RuntimeException] {
      Pipeline.withRetries(2) { m += 1; sys.error("always") }
    }
    assert(m == 2, "stage attempted exactly maxAttempts times")
  }
}
