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
