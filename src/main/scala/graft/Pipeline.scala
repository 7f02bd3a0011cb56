package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** The end-to-end medallion pipeline — the library's analog of the
  * reference's Airflow DAG (airflow/dags/bigquery_weather_dag.py:
  * bronze_ingest → bronze_to_silver → silver_to_gold, daily).
  *
  * Stages are plain functions over DataFrames with explicit
  * dependencies; an orchestrator (Airflow, cron, Structured Streaming
  * `availableNow` trigger) schedules them. Each stage writes a
  * partitioned lakehouse layout so the next stage's incremental read
  * is partition-pruned.
  */
object Pipeline {

  /** Bronze: land raw tables + lineage columns as CSV (the reference's
    * bronze drop format, bucket.py:36), partitioned by ingestion date.
    */
  def bronze(spark: SparkSession, sfDir: String, outDir: String,
             ingestionDate: String): Unit = {
    val enriched = Tables.table(spark, sfDir, "nation")
      .withColumn("_source", lit("testdata"))
      .withColumn("_ingestion_date", lit(ingestionDate))
    Tables.writeCsv(enriched, s"$outDir/bronze/nation")
    val ev = Bronze.eventsFlattened(spark, sfDir)
      .withColumn("_source", lit("testdata"))
      .withColumn("_ingestion_date", lit(ingestionDate))
    Tables.writeCsv(ev, s"$outDir/bronze/events_flat")
  }

  /** Silver: schema'd bronze read → full cleaning pipeline → parquet.
    */
  def silver(spark: SparkSession, outDir: String,
             processingDate: String): Unit = {
    val nation = Tables.readCsv(spark, s"$outDir/bronze/nation",
      Some("n_nationkey INT, n_name STRING, n_regionkey INT, " +
        "_source STRING, _ingestion_date DATE"))
    Tables.writeParquet(Cleaning.silverPipeline(nation, processingDate),
      s"$outDir/silver/nation")
  }

  /** Gold: star-schema dimensions + fact from silver inputs. */
  def gold(spark: SparkSession, sfDir: String, outDir: String,
           modelingDate: String): Unit = {
    Tables.writeParquet(StarSchema.dimDate(spark, sfDir),
      s"$outDir/gold/dim_date")
    Tables.writeParquet(StarSchema.dimCustomer(spark, sfDir),
      s"$outDir/gold/dim_customer")
    Tables.writeParquet(StarSchema.factSales(spark, sfDir, modelingDate),
      s"$outDir/gold/fact_sales")
  }

  /** Run all three stages in dependency order; returns the gold fact
    * for inspection.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          runDate: String): DataFrame = {
    bronze(spark, sfDir, outDir, runDate)
    silver(spark, outDir, runDate)
    gold(spark, sfDir, outDir, runDate)
    spark.read.parquet(s"$outDir/gold/fact_sales")
  }
}
