package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The CONTINUOUS form of the incremental corpus pipeline
  * (SURVEY.md §2.10 O6): a Structured Streaming source of raw
  * documents lands through [[graft.Pipeline.corpusIncrement]] one
  * micro-batch at a time — the same accept/reject decision, persisted
  * index append, shard-local gold rebuild and landed-marker commit the
  * batch form runs, driven by a stream instead of a scheduler.
  *
  * Exactly-once BY CONSTRUCTION, at two independent layers:
  *  1. the stream's own checkpoint (`checkpointDir`) stops a restarted
  *     query from re-reading files it already processed;
  *  2. if a micro-batch IS redelivered anyway (fresh checkpoint, a
  *     crash between the sink's commit and the stream's — the
  *     at-least-once delivery cases foreachBatch is documented to
  *     have), `corpusIncrement`'s content-derived batch id matches the
  *     already-landed batch and the replay refusal is caught HERE and
  *     treated as "already done": at-least-once delivery becomes
  *     exactly-once landing. Any other failure still fails the query
  *     loudly.
  * Empty micro-batches are skipped outright — every empty set has the
  * same content id, so landing one would make all later empty batches
  * look like replays (and there is nothing to land).
  */
object CorpusStream {

  def corpusIncrementSink(docs: DataFrame, outDir: String,
                          runDate: String, checkpointDir: String,
                          epoch: Int = 1,
                          recipe: graft.operators.Corpus.TrainingRecipe =
                            graft.operators.Corpus.TrainingRecipe.Default)
      : StreamingQuery = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          try {
            graft.Pipeline.corpusIncrement(batch.sparkSession, outDir,
              batch.toDF(), runDate, epoch, recipe)
            ()
          } catch {
            // the redelivery case: this exact batch already landed —
            // typed, never a message-substring match. ONLY the landed
            // subtype: an index-level ReplayRefused from inside the
            // pipeline (a batch some other writer published to the
            // dedup index but never landed) means silver/gold did NOT
            // get these documents, and treating it as done would
            // silently drop the micro-batch — it fails the query.
            case _: graft.BatchAlreadyLanded => ()
          }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
