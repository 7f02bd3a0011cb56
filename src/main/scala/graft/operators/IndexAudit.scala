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
}
