package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** O6d — STREAMING SNAPSHOT PROMOTION: the exactly-once foreachBatch
  * discipline of [[CorpusStream]]/[[VectorStream]]/[[Bm25Stream]]
  * applied to the pointer-served table family — a streaming GOLD that
  * serves every micro-batch through an atomically-swapped pointer, so
  * a dashboard or trainer reading the table never sees a gap, a
  * half-landed batch, or the same batch twice.
  *
  * The storage is the MANIFEST table ([[graft.sources.ManifestStore]])
  * with the batch's own CONTENT-DERIVED id as the partition value:
  * each micro-batch publishes one new partition (one file write, one
  * manifest carrying every prior batch's entries untouched, one
  * pointer swap), so the per-batch cost is O(batch) — never a
  * re-write of the accumulated table, which is what promoting
  * micro-batches through full physical snapshot generations would
  * cost. [[graft.sources.ManifestStore.compactSmallPartitions]] is
  * the matching maintenance op once many small batch partitions
  * accumulate (partition values — the replay ledger — survive the
  * rewrite).
  *
  * Exactly-once BY CONSTRUCTION, the same two independent layers as
  * the index streams:
  *  1. the stream's checkpoint stops a restarted query from
  *     re-reading processed files;
  *  2. a redelivered micro-batch (fresh checkpoint, crash between the
  *     publish and the stream's commit) carries the same rows, so its
  *     content-derived batch id matches a partition the CURRENT
  *     manifest already lists — [[publishBatch]] refuses with the
  *     typed [[graft.BatchAlreadyLanded]], the sink treats it as
  *     "already done", and at-least-once delivery becomes
  *     exactly-once promotion. The guard is a driver-side manifest
  *     lookup (metadata, never a data read) and SURVIVES retention:
  *     manifests age out, but every batch partition rides forward in
  *     the current manifest's entry list.
  *
  * SCOPE of layer 2 — identical composition only, the same contract
  * as the index streams: a fresh-checkpoint re-read under a DIFFERENT
  * file grouping composes the same rows into differently-id'd batches
  * and lands them twice. One checkpoint per table.
  */
object SnapshotStream {

  /** Promote one batch as a content-keyed partition of the manifest
    * table at `root`. Refuses with the typed
    * [[graft.BatchAlreadyLanded]] when the current manifest already
    * lists the batch's content id — the O(metadata) replay guard.
    * Returns the committed generation.
    */
  def publishBatch(spark: SparkSession, batch: DataFrame,
                   rootOrTable: String,
                   idCol: String, keep: Int = 3,
                   retainMs: Long = 0L): Long = {
    val M = graft.sources.ManifestStore
    // the target accepts a catalog/view identifier next to the raw
    // root path (resolved once, the graft-cdf discipline)
    val root = graft.sources.GraftSqlDml.resolveTableOrPath(spark,
      rootOrTable)
    val bid = graft.operators.Dedup.batchId(batch, idCol)
    M.currentGen(spark, root).foreach { g =>
      // one group parse on a list-layout table — the replay guard
      // stays O(metadata) even when the manifest itself is two-level
      if (M.partitionServed(spark, root, g, bid))
        throw new graft.BatchAlreadyLanded(
          s"snapshot promotion replay refused: batch $bid is already " +
            s"a partition of $root's serving manifest — re-promoting " +
            "a committed micro-batch would double-count it")
    }
    // retainMs rides through to the manifest publish; the table's
    // configured grace is preserved either way by the publish-side
    // ratchet (max with the prior pointer's grace= line)
    M.publish(spark, batch.withColumn("snapshot_batch", lit(bid)),
      root, "snapshot_batch", Nil, keep, retainMs = retainMs)
  }

  /** The streaming sink: every micro-batch promotes through
    * [[publishBatch]]; a redelivered batch's typed refusal is treated
    * as already-done (layer 2 above); empty micro-batches are skipped
    * outright (all empty sets share one content id). Any other
    * failure fails the query loudly.
    */
  def snapshotSink(stream: DataFrame, root: String,
                   checkpointDir: String, idCol: String,
                   keep: Int = 3, retainMs: Long = 0L): StreamingQuery =
    snapshotSinkWithProbe(stream, root, checkpointDir, idCol, keep,
      () => (), retainMs)

  /** [[snapshotSink]] with a probe fired after each promotion —
    * exists so the never-gaps reader contract is TESTED across
    * micro-batch boundaries, not asserted.
    */
  private[graft] def snapshotSinkWithProbe(stream: DataFrame,
                                           rootOrTable: String,
                                           checkpointDir: String,
                                           idCol: String, keep: Int,
                                           afterBatch: () => Unit,
                                           retainMs: Long = 0L)
      : StreamingQuery = {
    // identifiers resolve ONCE, here — not per micro-batch
    val root = graft.sources.GraftSqlDml.resolveTableOrPath(
      stream.sparkSession, rootOrTable)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          try {
            publishBatch(batch.sparkSession, batch.toDF(), root,
              idCol, keep, retainMs)
            ()
          } catch {
            // the redelivery case: this exact batch already promoted
            // — typed, never a message-substring match
            case _: graft.BatchAlreadyLanded => ()
          }
          afterBatch()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
