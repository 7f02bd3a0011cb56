package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PUBLIC surface of the persisted-index integrity audit
  * ([[IndexProtocol.auditIndex]]) — fsck for the three serve loops
  * built on the shared batch-directory protocol (the BM25 postings
  * index, the vector index; the MinHash dedup index keeps
  * directory-visibility and has its own guards). An operator runs
  * this after an incident — a crashed maintenance job, a filesystem
  * event, a suspicious probe failure — and gets a bounded, typed
  * report instead of paging through directory listings: every meta
  * entry, batch directory, grace marker, and the snapshot-history log
  * classified against the committed truth, with `healthy=false` rows
  * marking the states that need action (a committed batch with no
  * payload, an unlisted orphan directory, a stale marker on a
  * committed id, a lost current-gen snapshot record).
  *
  * Pure metadata cost — one `_meta` read plus three listings, bounded
  * by the batch count (which compaction bounds), never by data size:
  * the audit of a 100 TB index costs the same as that of a 100 MB
  * one. The reference has no index to audit (BigQuery owns its
  * storage, bigquery.py:105); this is the operational complement the
  * lakehouse restatement needs once the storage layout is ours.
  */
object IndexAudit {

  /** Audit the index at `path`; one row per finding:
    * (kind, name, status, healthy) — see
    * [[IndexProtocol.auditIndex]] for the status taxonomy. Row order
    * is deterministic (meta-list order, then sorted names), so the
    * report is stable across runs and engines.
    */
  def audit(spark: SparkSession, path: String,
            nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val fs = graft.sources.Tables.fsFor(spark, path)
    val rows = IndexProtocol.auditIndex(fs, path, nowMs)
    import spark.implicits._
    rows.map(f => (f.kind, f.name, f.status, f.healthy))
      .toDF("kind", "name", "status", "healthy")
  }

  /** The one-line health verdict a scheduler branches on: true iff
    * the audit has no unhealthy finding.
    */
  def isHealthy(spark: SparkSession, path: String,
                nowMs: Long = System.currentTimeMillis()): Boolean =
    IndexProtocol.auditIndex(
      graft.sources.Tables.fsFor(spark, path), path, nowMs)
      .forall(_.healthy)

  /** Execute the SAFE remediations for the audit's findings — the
    * P11→X2b diagnose-then-remedy pattern applied to the index
    * protocol itself. A MAINTENANCE call (the single-logical-writer
    * contract applies: run it in the ingest scheduler's slot). Every
    * action either re-establishes an invariant or starts a bounded
    * reclaim clock; nothing committed is ever touched:
    *
    *  - stale marker on a committed id → cleared (what the next
    *    sweep's committed rail would do);
    *  - dangling marker (directory already gone) → cleared;
    *  - orphan directory → scheduled for reclaim with the ORPHAN
    *    GRACE floor, never deleted now (it may be an in-flight
    *    publish — the same ambiguity argument as compaction's
    *    retire sweep);
    *  - compaction residue (reserved merged shape, unambiguous) →
    *    scheduled for immediate reclaim;
    *  - missing current-gen history record → RE-RECORDED from the
    *    committed `_meta` bytes (the one lost-record case that is
    *    recoverable, because the current meta IS that gen's bytes —
    *    `topKAt(currentGen)` serves again);
    *  - a committed batch with lost payload is NOT repairable from
    *    metadata — reported as `unrepairable_missing_payload` so the
    *    operator restores the directory or drops the batch
    *    explicitly;
    *  - finally one sweep reclaims whatever clock has already
    *    expired (railed on the re-read committed list, as always).
    *
    * Returns one row per action taken: (kind, name, action).
    */
  def repair(spark: SparkSession, path: String,
             nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val fs = graft.sources.Tables.fsFor(spark, path)
    val actions = IndexProtocol.auditIndex(fs, path, nowMs).flatMap {
      case IndexProtocol.AuditFinding("marker", m,
          "stale_on_committed", _) =>
        IndexProtocol.clearPendingDelete(fs, path, m)
        Seq(("marker", m, "cleared_stale_marker"))
      case IndexProtocol.AuditFinding("marker", m, "dangling", _) =>
        IndexProtocol.clearPendingDelete(fs, path, m)
        Seq(("marker", m, "cleared_dangling_marker"))
      case IndexProtocol.AuditFinding("dir", d, "orphan", _) =>
        IndexProtocol.markPendingDelete(fs, path, d, nowMs,
          IndexProtocol.OrphanGraceMs)
        Seq(("dir", d, "scheduled_reclaim_orphan_grace"))
      case IndexProtocol.AuditFinding("dir", d,
          "compaction_residue", _) =>
        IndexProtocol.markPendingDelete(fs, path, d, nowMs, 0L)
        Seq(("dir", d, "scheduled_reclaim"))
      case IndexProtocol.AuditFinding("history", g,
          "current_missing", _) =>
        val raw = graft.sources.MetaSwap.readCommitted(fs,
          new org.apache.hadoop.fs.Path(s"$path/_meta"))
        IndexProtocol.recordMetaHistory(fs, path, g.toLong, raw)
        Seq(("history", g, "rerecorded_from_meta"))
      case IndexProtocol.AuditFinding("batch", b,
          "committed_missing_payload", _) =>
        Seq(("batch", b, "unrepairable_missing_payload"))
      case _ => Seq.empty
    }
    val swept = IndexProtocol.sweepPendingDeletes(fs, path, nowMs,
      IndexProtocol.committedFromMeta(fs, path))
      .map(b => ("dir", b, "reclaimed"))
    import spark.implicits._
    (actions ++ swept).toDF("kind", "name", "action")
  }
}
