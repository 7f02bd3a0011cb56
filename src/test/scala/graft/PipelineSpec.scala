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
}
