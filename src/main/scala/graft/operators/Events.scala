package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream analytics (batch form; the streaming form with
  * watermarks lives in [[graft.streaming.EventStream]]).
  *
  * The reference's cadence is daily API batches orchestrated by Airflow
  * (airflow/dags/bigquery_weather_dag.py:23, `schedule='@daily'`);
  * re-expressed Spark-first as time-windowed processing over the
  * `events` table, which is the same computation the Structured
  * Streaming pipeline runs continuously.
  *
  * Scale notes: windowed aggregation shuffles on (window, type) after
  * map-side partial agg; sessionization shuffles once on user_id and
  * sorts within partitions — both AQE-friendly, no global windows.
  */
object Events {

  /** Tumbling-window aggregation: hourly event counts + value sums per
    * event type. Value sums go through decimal so results are
    * bit-stable under any partitioning/order (see Analytics).
    */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.table(spark, sfDir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum(col("value").cast("decimal(18,6)")), 4).cast("double")
          .as("sum_value"))

  /** Staged funnel: how many users reached each step of
    * view → click → purchase in causal order (first view before first
    * click before first purchase). One group-by on user, then a single
    * global aggregate of three booleans — no joins, no windows.
    *
    * Timestamps are second-truncated before comparison: the source
    * parquet is nanosecond-precision, which Spark floors to µs at read
    * while a ns-native engine (the DuckDB oracle) keeps whole — a raw
    * strict `>` could disagree between engines for sub-µs gaps.
    * Second-level flooring makes both engines compare identical
    * values. Trade-off (deliberate): two steps inside the SAME second
    * count as not-ordered, so sub-second conversions are excluded from
    * the strict-order counts on BOTH engines.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    val perUser = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view",
        date_trunc("second", col("ts")))).as("t_view"),
      min(when(col("event_type") === "click",
        date_trunc("second", col("ts")))).as("t_click"),
      min(when(col("event_type") === "purchase",
        date_trunc("second", col("ts")))).as("t_purchase"))
    perUser.agg(
      count(col("t_view")).as("n_view"),
      count(when(col("t_click") > col("t_view"), 1)).as("n_view_then_click"),
      count(when(col("t_purchase") > col("t_click") &&
        col("t_click") > col("t_view"), 1)).as("n_full_funnel"))
  }

  /** E7 — AS-OF JOIN: for each left row, attach the payload of the
    * latest right row with the same key and timestamp ≤ the left's.
    * Spark has no native as-of join, and the naive `BETWEEN` range
    * join explodes to |key-group|² comparisons. This is the
    * single-shuffle formulation: tag both sides, union, one window
    * per key ordered by (ts, side-with-right-first, tie), and
    * forward-fill the right payload with `last(..., ignoreNulls)` —
    * O(n log n) within partitions, no pair explosion, AQE-friendly.
    * Right rows at exactly the left timestamp match (≤ semantics,
    * right sorts first on ties).
    *
    * `payload` columns must exist on `right`; they surface on every
    * left row (null until the first right row for that key).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val fill = payload.map(p => col(p).as(s"__p_$p"))
    val l = left
      .select((lCols.map(col) :+ lit(1).as("__side")) ++
        payload.map(p =>
          lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r = right
      .select((lCols.map(c =>
        (if (c == keyCol || c == tsCol || c == tieCol) col(c)
         else lit(null).cast(left.schema(c).dataType)).as(c))
        :+ lit(0).as("__side")) ++ fill: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .select((lCols.map(col) :+ col("__side")) ++
        payload.map(p =>
          last(col(s"__p_$p"), ignoreNulls = true).over(w)
            .as(s"asof_$p")): _*)
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Gap-based sessionization: a session ends after `gapMinutes` of
    * user inactivity. One shuffle on user_id; window functions run
    * within the per-user sort — the classic scalable formulation
    * (break flags → running sum → group).
    *
    * Gap comparisons run at microsecond precision — the precision
    * Spark's reader floors the ns source to (Tables.table). The DuckDB
    * oracle truncates its timestamps to microseconds before the same
    * lag/gap compare, so both engines split sessions on identical
    * values; only the emitted session bounds are second-truncated (see
    * the agg below).
    */
  /** E2b — gap sessionization via the BUILT-IN `session_window`
    * aggregation: one groupBy, no window functions — Spark merges
    * per-event [ts, ts+gap] windows into sessions inside the
    * aggregation itself, which is also the form that runs unchanged
    * as a streaming query. Break semantics MATCH [[sessionize]]
    * (spec-pinned, boundary case included: an event landing exactly
    * `gap` after its predecessor merges — the built-in's windows are
    * end-inclusive for merging, the same strict-> break as the window
    * form). What differs is the emitted session_end: last-event ts +
    * gap (the window's close), not the last event itself — part of
    * the built-in's contract, mirrored by the oracle.
    */
  def sessionizeNative(spark: SparkSession, sfDir: String,
                       gapMinutes: Int = 30): DataFrame =
    Tables.table(spark, sfDir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start"))
          .as("session_start"),
        date_trunc("second", col("session_window.end")).as("session_end"),
        col("n_events"))

  def sessionize(spark: SparkSession, sfDir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapExpr = expr(s"INTERVAL $gapMinutes MINUTES")
    val withBreak = ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + gapExpr, 1).otherwise(0))
    withBreak
      .withColumn("session_id",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        // second-truncated: source parquet is ns-precision, which Spark
        // floors to micros — sub-second output would be engine-dependent
        date_trunc("second", min(col("ts"))).as("session_start"),
        date_trunc("second", max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
