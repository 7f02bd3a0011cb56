package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for iterative operators
  * ([[operators.Dedup.resolveGroups]],
  * [[operators.Similarity.kmeansIterate]]).
  *
  * `localCheckpoint` materializes iteration state to executor block
  * storage — fast, but on a real cluster a lost executor takes its
  * blocks with it, and truncated lineage means there is nothing to
  * recompute from: the job dies mid-iteration. Reliable `checkpoint`
  * writes the state to the fault-tolerant checkpoint directory
  * (HDFS / object store) and survives executor loss — the right
  * trade for a 1000-executor run where some loss per hour is the
  * expected case, not the exception.
  *
  * The knob is the session's own checkpoint dir: when
  * `spark.sparkContext.setCheckpointDir(...)` has been called (every
  * production cluster submission should), iterative state checkpoints
  * reliably; local/dev sessions without one fall back to
  * `localCheckpoint`. Both paths are EAGER, so callers' sequencing —
  * materialize the small result, then unpersist the big intermediate —
  * behaves identically under either strategy (spec-asserted: both
  * converge to bit-identical results).
  */
object Checkpoints {
  // dev-only observability (plan evidence for the optimization
  // rounds): when SPARK_GRAFT_PLAN_DIR is set, the PRE-truncation
  // plan of every checkpointed intermediate is dumped there —
  // eager-materializing operators otherwise show only an
  // ExistingRDD scan to explain(). Absent env (every driver /
  // production run), nothing changes.
  private val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
  private val planSeq = new java.util.concurrent.atomic.AtomicInteger

  def truncate(df: DataFrame): DataFrame = {
    planDir.foreach { dir =>
      val i = planSeq.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"$dir/truncate_$i%03d.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
  }
}
