package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

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

  /** Events file-source stream with the same ts normalization the
    * batch reader applies ([[graft.sources.Tables.table]]: INT64
    * nanos OR un-flagged TIMESTAMP(MICROS) → microsecond
    * TimestampType). Schema is explicit — a streaming source cannot
    * infer — so the physical layout is probed once from the
    * directory's parquet footers via a batch read.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an empty directory cannot be probed (no footers to read) —
    // fall back to the INT64-nanos layout so the stream can be
    // declared before the first file arrives
    val tsIsLong = scala.util.Try(
      spark.read.parquet(dir).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType).getOrElse(true)
    val tsDecl = if (tsIsLong) "BIGINT" else "TIMESTAMP_NTZ"
    val raw = spark.readStream
      .schema(s"event_id BIGINT, ts $tsDecl, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
    if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
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

  /** Per-user session state for [[sessionizeStream]]: the currently
    * open session, in epoch micros.
    */
  case class OpenSession(startMicros: Long, lastMicros: Long, n: Long)

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  /** E5/E6 — streaming gap sessionization with CUSTOM state
    * (`flatMapGroupsWithState`): the one event pipeline the built-in
    * streaming operators can't express (per-key open-session state
    * with gap-close emission). Sessions closed by a later event in the
    * batch are emitted immediately; the still-open session is kept in
    * bounded per-key state and emitted when the event-time timeout
    * (watermark + gap) fires — state never outlives the watermark,
    * which is what keeps it finite on an infinite stream.
    *
    * The batch twin is [[graft.operators.Events.sessionize]]; the spec
    * asserts closed-session parity between the two.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    // emit second-truncated bounds (same output convention as the
    // batch twin); gap logic itself runs at full µs precision so the
    // two twins split sessions identically
    def toTs(micros: Long) =
      new java.sql.Timestamp((micros / 1000000L) * 1000L)

    def fn(userId: Long, batch: Iterator[(Long, java.sql.Timestamp)],
           state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, toTs(s.startMicros),
          toTs(s.lastMicros), s.n))
      }
      // events within one trigger arrive unsorted — order them here.
      // Full-µs instant: getTime*1000 alone floors to the millisecond
      // (dropping the sub-ms digits the batch twin keeps); the µs
      // remainder lives in getNanos.
      val sorted = batch.map { case (_, ts) =>
        ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
      }.toArray.sorted
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var open = state.getOption
      sorted.foreach { t =>
        open match {
          case Some(s) if t - s.lastMicros <= gapMicros =>
            open = Some(s.copy(lastMicros = t, n = s.n + 1))
          case Some(s) =>
            closed += SessionOut(userId, toTs(s.startMicros),
              toTs(s.lastMicros), s.n)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMicros / 1000L + gapMicros / 1000L)
      }
      closed.iterator
    }

    events
      .select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** E10 — stream-static dimension enrichment: every micro-batch of
    * the (unbounded) stream joins a STATIC dimension snapshot. The
    * static side is re-planned each micro-batch — a dimension refresh
    * lands without restarting the query — and broadcast, so the
    * stream side never shuffles: enrichment is a map-side hash lookup
    * per batch, the same shape at 100 TB/day as at test scale.
    * Left join: an event whose key is missing from the dimension
    * passes through with nulls rather than silently dropping.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   streamKey: String, dimKey: String): DataFrame =
    // side-qualified keys: with unqualified col() a dimension whose
    // key shares the stream's column name would be ambiguous
    events.join(broadcast(dim), events(streamKey) === dim(dimKey), "left")

  /** E11 — idempotent micro-batch file sink: `foreachBatch` +
    * DYNAMIC partition overwrite, partitioned by (event_date,
    * batch_id). A replayed micro-batch (the at-least-once delivery
    * case after a failure) rewrites exactly the (date, batch)
    * partitions it owns instead of appending duplicates — the
    * standard exactly-once-effective recipe when the target is a
    * plain file layout rather than a transactional table. The
    * batch_id level is what makes the overwrite safe when one date
    * spans several micro-batches: without it a later batch's dynamic
    * overwrite of a shared date would DELETE the earlier batch's
    * rows. Readers prune on event_date as usual; batch_id is just a
    * second directory level.
    */
  def idempotentDailyWrite(batch: DataFrame, outDir: String,
                           batchId: Long): Unit =
    batch
      .withColumn("event_date", col("ts").cast("date").cast("string"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date", "batch_id")
      .parquet(outDir)

  def idempotentDailySink(events: DataFrame,
                          outDir: String): StreamingQuery = {
    val q = events.writeStream
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        idempotentDailyWrite(batch.toDF(), outDir, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Run a streaming DataFrame to completion against the (finite) file
    * source into an in-memory table; returns the query after all
    * available data is processed. Used by specs and local smoke runs.
    */
  /** E12 — stream-stream INTERVAL join: left-side events matched to
    * right-side events of the same key whose event time falls in
    * [left ts, left ts + bound] — the attribution join (view →
    * purchase-within-the-hour) that needs BOTH sides streaming,
    * where [[enrichStream]] joins a stream to a static table.
    *
    * Both sides carry a watermark and the join predicate carries an
    * explicit time range — together they BOUND the join state: an
    * unmatched left row can be dropped once the watermark passes its
    * ts + bound, a right row once the watermark passes its ts, so
    * state never grows with the stream (this is exactly the condition
    * Structured Streaming requires to run a stream-stream inner join
    * at all). Inner matches emit eagerly — append mode, no
    * end-of-window latency — and the emitted set equals the batch
    * interval join over the same data (gate-asserted against the
    * DuckDB mirror).
    *
    * Column contract: `left`/`right` are projections of event streams
    * with a shared join key `keyCol` and DISTINCT other column names
    * (rename before joining); `leftTs`/`rightTs` name each side's
    * event-time column.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keyCol: String, leftTs: String, rightTs: String,
                         bound: String = "2 hours",
                         watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r.withColumnRenamed(keyCol, "__rk"),
      col(keyCol) === col("__rk") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bound"))
      .drop("__rk")
  }

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
