package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-read patterns.
  *
  * Reference behavior: src/etl/utils/bigquery.py:96 `read_bq_table` —
  * facts are read as "today's partition"
  * (`WHERE DATE(_ingestion_date) = today`) and dimensions as "latest
  * partition" (`WHERE d = (SELECT MAX(d) FROM t)`).
  *
  * Scale notes: with a `partitionBy(date)` lakehouse layout
  * ([[graft.sources.Tables.writeParquet]]) the as-of filter is pure
  * partition pruning — zero data read outside the target date. The
  * latest-partition read computes MAX via a tiny aggregate (map-side
  * partial → one value) and broadcasts it back as a join — never a
  * global window (which would single-partition the world) and never a
  * driver collect inside the plan.
  */
object Incremental {

  /** Rows belonging to the most recent value of `partCol`
    * (dimension-read pattern, bigquery.py:113).
    */
  def latestPartition(df: DataFrame, partCol: Column): DataFrame = {
    val mx = df.agg(max(partCol).as("__latest"))
    df.join(broadcast(mx), partCol === col("__latest")).drop("__latest")
  }

  /** Rows belonging to one as-of value of `partCol` (fact-read pattern,
    * bigquery.py:107). A plain pushed-down filter: on a partitioned
    * layout this prunes to a single partition.
    */
  def asOfPartition(df: DataFrame, partCol: Column, asOf: Column): DataFrame =
    df.filter(partCol === asOf)

  /** Latest record per key — the read-side resolution of the
    * reference's append-only loading (bigquery.py:141 WRITE_APPEND +
    * "latest" reads): successive loads append versions; consumers see
    * only the newest row per business key.
    *
    * Formulated as a `max_by` AGGREGATION, not a window `row_number`:
    * aggregation gets map-side partial combine, so a hot key collapses
    * to one row per input partition BEFORE the shuffle — skew-immune —
    * while the window form must shuffle and sort every version of the
    * hot key into one task. Deterministic: ordering key is the
    * (orderCol, tieBreak) struct, compared field-by-field.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCol: Column,
                  tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.functions.{max_by, struct}
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(orderCol, tieBreak)).as("__row"))
      .select(col("__row.*"))
  }

  /** S12 — CDC-style snapshot diff: classify every key across two
    * snapshots of the same schema as `added` (only in `after`),
    * `removed` (only in `before`), `changed` (both, different non-key
    * columns) or `unchanged` — the change-detection read a lakehouse
    * runs between successive loads of the reference's append-only
    * tables (bigquery.py:141 WRITE_APPEND) to emit a delta instead of
    * reprocessing the world.
    *
    * One full-outer shuffle join on the key; the non-key columns ride
    * as ONE struct per side, compared null-safely in a codegen'd
    * expression (`<=>` — a null attribute can't silently classify as
    * `unchanged`). Returns `keys…, before, after, change`.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val rest = before.columns.filterNot(keys.contains).toIndexedSeq
    require(after.columns.filterNot(keys.contains).toIndexedSeq == rest,
      s"snapshot schemas differ: $rest vs " +
        after.columns.filterNot(keys.contains).mkString(","))
    val a = before.select(
      (keys.map(col) :+ struct(rest.map(col): _*).as("before")): _*)
    val b = after.select(
      (keys.map(col) :+ struct(rest.map(col): _*).as("after")): _*)
    a.join(b, keys, "full_outer")
      .withColumn("change",
        when(col("before").isNull, lit("added"))
          .when(col("after").isNull, lit("removed"))
          .when(!(col("before") <=> col("after")), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** S17 — partition-scoped UPSERT (the MERGE INTO of a parquet
    * lakehouse): land `batch` into the `partCol`-partitioned table at
    * `path`, rewriting ONLY the partitions the batch touches. Per
    * key, the surviving row is latest-by-`versionCol`, ties resolved
    * toward the batch (so replaying the same batch is idempotent:
    * the second run rewrites the same partitions to the same rows).
    *
    * Why it scales: the merge READS only the touched partitions
    * (partition-pruned scan — the batch's partition list is a tiny
    * distinct, collected at planning time like any file listing), the
    * per-key resolution is one `max_by` groupBy over batch ∪ touched
    * (never the table), and the write is a dynamic partition
    * overwrite — untouched partitions are never opened, never
    * rewritten, byte-identical after the upsert (spec-asserted). A
    * whole-table MERGE at 100 TB is a full rewrite; this is
    * proportional to the partitions the batch actually lands in.
    *
    * CONTRACT: `partCol` must be stable under updates for a given key
    * (entity-creation date, hash bucket — not a mutable attribute).
    * If an update moved a key's partition, its old row would live in
    * a partition this merge never reads. That is the standard
    * partition-merge precondition, and the key-stable layouts above
    * are how production tables satisfy it.
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
                        path: String, batch: DataFrame, keys: Seq[String],
                        partCol: String, versionCol: String): Unit = {
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0))
    val current = graft.sources.Tables.readEvolved(spark, path)
      .filter(col(partCol).isin(touched: _*))
    // batch outranks current on version ties → idempotent replay
    val merged = latestByKey(
      current.withColumn("__src", lit(0))
        .unionByName(batch.withColumn("__src", lit(1))),
      keys, col(versionCol), col("__src")).drop("__src")
    // materialize before the overwrite: the merge plan READS the very
    // partitions the write replaces (Spark refuses a lazy
    // self-overwrite, and rightly — a task retry mid-swap would
    // re-read half-replaced input). Checkpointing the batch-sized
    // merge result cuts the lineage back to durable storage.
    graft.Checkpoints.truncate(merged)
      .repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
  }
}
