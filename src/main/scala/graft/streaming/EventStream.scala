package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming form of the event pipeline (SURVEY.md §2.5
  * E3–E4).
  *
  * The reference runs its pipeline as daily Airflow batches
  * (airflow/dags/bigquery_weather_dag.py:23); the Spark-first
  * restatement is a continuous pipeline: file-source `readStream` →
  * watermarked windowed aggregation → sink, plus streaming dedup
  * within the watermark. The batch [[graft.operators.Events]] rollup
  * computes the same result — one definition, two execution modes,
  * which is exactly Structured Streaming's contract.
  *
  * Scale notes: the watermark bounds state (late events beyond it are
  * dropped, so state per key-window is finite); `availableNow`
  * triggers let the same query run as an incremental batch job on a
  * 100 TB backlog without unbounded state growth.
  */
object EventStream {

  /** Events file-source stream with the same ns→µs conversion the
    * batch reader applies. Schema is explicit — a streaming source
    * cannot infer.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** E3 — watermarked tumbling-window rollup (streaming twin of
    * Events.hourlyRollup).
    */
  def windowedRollup(events: DataFrame,
                     watermark: String = "1 hour",
                     window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** E4 — streaming dedup on event_id bounded by the watermark (state
    * is dropped once the watermark passes — the only way dedup state
    * stays finite on an infinite stream).
    */
  def dedupStream(events: DataFrame,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming DataFrame to completion against the (finite) file
    * source into an in-memory table; returns the query after all
    * available data is processed. Used by specs and local smoke runs.
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
