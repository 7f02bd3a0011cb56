package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The CONTINUOUS form of dense-index ingest (SURVEY.md §2.7 O6b —
  * the [[CorpusStream]] discipline applied to the vector index): a
  * Structured Streaming source of embedding rows lands through
  * [[graft.operators.VectorIndex.append]] one micro-batch at a time —
  * each micro-batch encoded with the index's STORED artifacts and
  * published as one atomic batch directory.
  *
  * Exactly-once BY CONSTRUCTION, the same two independent layers as
  * the corpus stream:
  *  1. the stream's checkpoint stops a restarted query from
  *     re-reading processed files;
  *  2. a redelivered micro-batch (fresh checkpoint, crash between the
  *     publish and the stream's commit) carries the same id set, so
  *     its content-derived batch id matches the already-published
  *     directory and the replay refusal is caught HERE and treated as
  *     "already done" — at-least-once delivery becomes exactly-once
  *     publication. Any other failure still fails the query loudly.
  * Empty micro-batches are skipped outright (same rationale as
  * [[CorpusStream]]: all empty sets share one content id).
  *
  * SCOPE of layer 2 — identical composition only, the same contract
  * as [[Bm25Stream]]: a fresh-checkpoint re-read under a DIFFERENT
  * file grouping composes the same vectors into differently-id'd
  * batches and would land them twice. One checkpoint per index;
  * resetting it against a live index means rebuilding (or dropping
  * the re-read batches). Here the failure mode is duplicate code
  * rows rather than corrupted scalars — [[VectorIndex.topK]]'s
  * read-side dropDuplicates masks the scoring impact, but the index
  * still carries the dead weight.
  */
object VectorStream {

  def vectorIndexSink(emb: DataFrame, indexPath: String,
                      checkpointDir: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): StreamingQuery = {
    val q = emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          try {
            graft.operators.VectorIndex.append(batch.toDF(), idCol,
              vecCol, indexPath)
            ()
          } catch {
            // the redelivery case: this exact batch already committed
            // (or was committed and since compacted away) — typed,
            // never a message-substring match
            case _: graft.ReplayRefused => ()
          }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
