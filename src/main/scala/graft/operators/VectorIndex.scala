package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A6b — the PERSISTED vector index (SURVEY.md §2.7): the serve shape
  * of the ANN family, completing the build-once/probe-many discipline
  * of the dedup index (D8b) and the BM25 postings index (T13c) for
  * vectors. What a 100 TB deployment keeps on disk is exactly this:
  *
  *   path/
  *     centroids/              (cell, centv)        — coarse quantizer
  *     codebook/               (subspace, code, centv) — PQ codebooks
  *     batches/<bid>/cellCodes/cell=<c>/ (id, subspace, code)
  *                             — one directory per ingested batch,
  *                               codes PARTITIONED by coarse cell
  *     _meta                   (m, dim, batches, retired) — commit
  *                             marker AND visibility list
  *
  * The training artifacts (centroids from [[Similarity.kmeansIterate]]
  * or any quantizer, codebook from [[Similarity.pqTrain]]) are INPUTS:
  * the write assembles and lays out, it never trains — re-index and
  * re-train stay independently schedulable, the same separation the
  * reference keeps between derivation and load jobs
  * (silver_to_gold.py:23 vs bigquery.py:105).
  *
  * VISIBILITY IS META-DRIVEN, exactly the [[Bm25.Bm25Meta]] protocol:
  * a batch serves if and only if it is on the meta's committed list.
  * A directory whose meta swap never landed (crashed [[append]]) is
  * invisible and reclaimed as crash residue by the next publish of
  * the same id; a directory half-deleted by a crashed [[dropBatch]]
  * is equally invisible, because the list shrank BEFORE the delete
  * started. Probes can never see a torn state. The `retired` list
  * carries batch ids superseded by [[compact]], so replay refusal
  * survives compaction without payload-free tombstone directories.
  *
  * INCREMENTAL ingest is the D8b batch protocol verbatim: [[append]]
  * encodes a new batch with the STORED artifacts (standard IVF
  * behavior — appending never retrains; retrain-and-reindex is a
  * separate scheduled rebuild), stages it under `_staging/<bid>`,
  * publishes with one atomic directory rename, and commits it with a
  * self-healing `_meta.next` swap. A batch id already on the
  * committed (or retired) list is refused loudly (O(1) probe), so
  * redelivered embedding batches cannot double-count candidates.
  *
  * Serve cost: a probe resolves its queries' probed cells DRIVER-side
  * (|queries|·nprobe rows — the "query router" of a real vector DB),
  * opens only those `cell=<c>` partition directories across the
  * COMMITTED batches by explicit path, and runs the cell-local ADC +
  * exact re-rank of [[Similarity.ivfpqShortlist]]/
  * [[Similarity.pqRerank]] over them. Scanned input ∝ probed cells,
  * never the corpus.
  *
  * Commit protocol: tables first, `_meta` LAST (the
  * [[Bm25.writeBm25Index]] marker discipline) — a crash mid-build
  * leaves a directory every probe refuses loudly, and [[write]] can
  * be safely re-run over it (uncommitted residue is wiped wholesale).
  * [[write]] REFUSES a path with a committed meta: rebuilding in
  * place would mix codes encoded under two codebooks; the documented
  * retrain→reindex flow is write-to-a-fresh-root + [[writePointer]].
  */
object VectorIndex {

  // one shared resolver ([[graft.sources.Tables.fsFor]]) so "the same
  // FS primitive as every publish path" is structural, not copy-paste
  private def fsFor(spark: SparkSession,
                    path: String): org.apache.hadoop.fs.FileSystem =
    graft.sources.Tables.fsFor(spark, path)

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_meta")

  /** The committed state of an index: PQ geometry plus the two
    * visibility lists. `batches` serve; `retired` only refuse replay.
    * `gen` is the swap FENCE: a counter [[swapMeta]] bumps on every
    * commit so no two successive committed metas are ever
    * byte-identical — without it, a maintenance swap that changes
    * nothing else (the single-batch compaction no-op) would be
    * invisible to a concurrent writer's compare-and-set, and the
    * racing append the swap exists to fail would commit against a
    * marker the sweep had already acted on.
    */
  private[graft] final case class VecMeta(m: Int, dim: Int,
                                          batches: Seq[String],
                                          retired: Seq[String],
                                          gen: Long = 0L)

  /** Read the committed meta ALONG WITH its raw bytes — the bytes are
    * what a maintenance path hands back to [[swapMeta]] as its CAS
    * expectation. Self-healing: a crash between a swap's delete-old
    * and rename-new steps leaves `_meta.next` without `_meta`; the
    * next reader completes the rename and proceeds.
    */
  private[graft] def readMetaRaw(spark: SparkSession,
                                 path: String): (VecMeta, Array[Byte]) = {
    val fs = fsFor(spark, path)
    val p = metaPath(path)
    graft.sources.MetaSwap.heal(fs, p)
    require(fs.exists(p),
      s"no committed vector index at $path (missing _meta — " +
        "half-built index or wrong path); build one with " +
        "VectorIndex.write")
    val raw = graft.sources.MetaSwap.readCommitted(fs, p)
    (parseVecMeta(raw, path), raw)
  }

  /** Parse serialized meta bytes — shared by the live read above and
    * the as-of-gen history read ([[topKAt]]), so the two views can
    * never diverge in format handling.
    */
  private def parseVecMeta(raw: Array[Byte], path: String): VecMeta = {
    val kv = new String(raw, "UTF-8").linesIterator
      .map(_.split("=", 2)).collect {
        case Array(a, b) => a -> b
      }.toMap
    // a meta WITHOUT a batches key is the pre-committed-list format:
    // defaulting it to empty would make a healthy index refuse every
    // probe and — worse — let append/compact delist and sweep its
    // data; refuse loudly instead (rebuild to a fresh root, or add
    // the key listing the live batch dirs by hand)
    require(kv.contains("batches"),
      s"vector index meta at $path predates the committed-batch " +
        "list format — refusing to guess visibility; rebuild the " +
        "index (VectorIndex.write to a fresh root + writePointer) " +
        "or add a batches= line listing the live batch directories")
    VecMeta(kv("m").toInt, kv("dim").toInt,
      kv("batches").split(",").toSeq.filter(_.nonEmpty),
      kv.getOrElse("retired", "").split(",").toSeq.filter(_.nonEmpty),
      kv.getOrElse("gen", "0").toLong)
  }

  private[graft] def readMeta(spark: SparkSession,
                              path: String): VecMeta =
    readMetaRaw(spark, path)._1

  private def metaBytes(m: VecMeta): Array[Byte] =
    (s"m=${m.m}\ndim=${m.dim}\nbatches=${m.batches.mkString(",")}\n" +
      s"retired=${m.retired.mkString(",")}\ngen=${m.gen}\n")
      .getBytes("UTF-8")

  /** Commit a new meta with the COMPARE-AND-SET `_meta.next` swap
    * ([[graft.sources.MetaSwap]] — shared with the BM25 index):
    * `expect` is the committed bytes this writer read, so a
    * concurrent append/drop/compact landing in between fails this
    * commit loudly instead of silently delisting the other writer's
    * batch — the single-logical-writer contract, enforced.
    */
  private def swapMeta(fs: org.apache.hadoop.fs.FileSystem,
                       path: String, m: VecMeta,
                       expect: Array[Byte]): Unit = {
    // bump the fence on EVERY commit: successive committed metas are
    // never byte-identical, so even a state-preserving swap (the
    // no-op compaction) invalidates a concurrent writer's stale CAS
    // expectation instead of sliding under it
    val next = m.copy(gen = m.gen + 1)
    val bytes = metaBytes(next)
    graft.sources.MetaSwap.swap(fs, metaPath(path), bytes, expect)
    // snapshot log for as-of-gen probes — recorded AFTER the swap, so
    // it never alters commit semantics (see IndexProtocol)
    IndexProtocol.recordMetaHistory(fs, path, next.gen, bytes)
  }

  /** Stage a batch's cell-partitioned codes and publish them with one
    * atomic rename. A batch id on the committed or retired list
    * refuses loudly (O(1), the [[Bm25]] replay guard); an UNLISTED
    * existing directory is crash residue from a publish whose meta
    * swap never landed — deleted and re-staged, so residue can never
    * ride into the live index.
    */
  private def publishBatch(emb: DataFrame, idCol: String,
                           vecCol: String, centroids: DataFrame,
                           codebook: DataFrame, m: Int, dim: Int,
                           path: String, bid: String,
                           committed: Seq[String],
                           retired: Seq[String]): Unit = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    val target = new org.apache.hadoop.fs.Path(s"$path/batches/$bid")
    if (committed.contains(bid)) throw new graft.ReplayRefused(
      s"VectorIndex append refused: batch $bid is already committed " +
        s"at $target — a replayed embedding batch would double-count " +
        "every candidate it carries; drop it from the meta first if " +
        "this is an intentional re-ingest")
    if (retired.contains(bid)) throw new graft.ReplayRefused(
      s"VectorIndex append refused: batch $bid was committed and " +
        "later compacted away — its codes already live in the merged " +
        "batch; a replay would double-count every candidate")
    // a pending grace-period delete of this id must be forgotten
    // BEFORE the id is re-staged, or a later sweep would reap the
    // re-ingested batch
    IndexProtocol.clearPendingDelete(fs, path, bid)
    // crash residue (published dir, meta swap never committed):
    // invisible to probes, safe to redo wholesale
    // VERIFIED delete: renaming into a still-existing directory
    // nests the staged payload under the residue and returns true —
    // the meta would commit a batch dir holding stale files
    if (fs.exists(target) && !fs.delete(target, true))
      throw new IllegalStateException(
        s"cannot reclaim crash residue at $target before publishing " +
          s"batch $bid — refusing to rename into an existing directory")
    // VERIFIED staging wipe: the rename source is the staging
    // PARENT and the write below only refreshes its cellCodes child,
    // so a failed delete could leave stale siblings from a crashed
    // earlier publish that the rename would commit
    val stagingRoot =
      new org.apache.hadoop.fs.Path(s"$path/_staging/$bid")
    if (fs.exists(stagingRoot) && !fs.delete(stagingRoot, true))
      throw new IllegalStateException(
        s"cannot wipe stale staging at $stagingRoot before " +
          s"publishing batch $bid")
    // ONE root, children derived from it: the wiped, written, and
    // renamed directory can never drift apart in a future edit
    val staging = new org.apache.hadoop.fs.Path(stagingRoot, "cellCodes")
    Similarity.pqEncodeCells(emb, idCol, vecCol, centroids, codebook,
        m, dim)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(staging.toString)
    fs.mkdirs(target.getParent)
    require(fs.rename(stagingRoot, target),
      s"atomic publish of batch $bid failed (staging → $target)")
  }

  /** Assemble and publish the index from its trained artifacts; the
    * initial corpus lands as batch `bootstrap`, committed by the
    * meta written LAST. Refuses a path that already serves a
    * committed index — an in-place rebuild would first destroy the
    * serving artifacts and could leave old-codebook batches visible
    * next to new ones; retrain→reindex goes to a FRESH root behind
    * [[writePointer]]. A path holding only uncommitted residue (a
    * crashed earlier write) is wiped and rebuilt — re-running a
    * failed bootstrap is always safe.
    */
  def write(emb: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, codebook: DataFrame,
            m: Int, dim: Int, path: String): Unit = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    // complete a crashed swap first so it registers as committed
    graft.sources.MetaSwap.heal(fs, metaPath(path))
    require(!fs.exists(metaPath(path)),
      s"refusing to rebuild over the COMMITTED vector index at $path " +
        "— in-place rebuilds mix codes from two codebooks and drop " +
        "the serving index on failure; write to a fresh root and " +
        "republish with VectorIndex.writePointer (or drop the old " +
        "root explicitly first)")
    // wipe crash residue by COMPONENT, never the root wholesale: a
    // mistyped path pointing at a shared directory must cost at most
    // the index-shaped names under it (_meta_history/_pending_delete
    // included — stale snapshot records from a torn-down predecessor
    // index must not resolve against the new one's batches)
    Seq("centroids", "codebook", "batches", "_staging", "_meta.next",
      "_meta_history", "_pending_delete")
      .foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$c"), true); ()
      }
    centroids.select(col("cell"), col("centv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    codebook.select(col("subspace"), col("code"), col("centv"))
      .write.mode("overwrite").parquet(s"$path/codebook")
    publishBatch(emb, idCol, vecCol, centroids, codebook, m, dim,
      path, "bootstrap", Seq.empty, Seq.empty)
    val m0bytes = metaBytes(VecMeta(m, dim, Seq("bootstrap"), Seq.empty))
    val out = fs.create(metaPath(path), true)
    try out.write(m0bytes)
    finally out.close()
    IndexProtocol.recordMetaHistory(fs, path, 0L, m0bytes)
  }

  /** Daily dense ingest: encode `emb` with the STORED artifacts,
    * publish it as one atomic batch directory, and commit it with a
    * meta swap adding the batch to the visibility list. Never
    * retrains, never touches existing batches — `mode = "append"` in
    * the reference's warehouse sense (bigquery.py:141). Returns the
    * published batch id (content-derived from the batch's id set
    * unless supplied).
    */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             path: String, batchId: Option[String] = None): String = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    val (meta, raw) = readMetaRaw(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
    val codebook = spark.read.parquet(s"$path/codebook")
    val bid = batchId.getOrElse(Dedup.batchId(emb, idCol))
    // a supplied id becomes a directory name and a meta-list entry;
    // content-derived ids are hex, but a caller's id must not smuggle
    // separators or the cell= marker the probe's path parser keys on —
    // and the merged-batch shape is reserved for compaction
    IndexProtocol.validateAppendId(bid, "VectorIndex")
    publishBatch(emb, idCol, vecCol, centroids, codebook, meta.m,
      meta.dim, path, bid, meta.batches, meta.retired)
    swapMeta(fs, path, meta.copy(batches = meta.batches :+ bid), raw)
    // a racing maintenance sweep may have orphan-marked this batch
    // between its publish and the swap above (the directory was
    // unlisted then); the batch is committed now, so the marker is
    // stale — clear it, or a LATER drop's first-marker-wins would
    // inherit the orphan deadline and silently truncate the grace
    // window that drop promises
    IndexProtocol.clearPendingDelete(fs, path, bid)
    bid
  }

  /** The `cell=<c>` partition directories matching `cells`, across
    * every batch LISTED IN THE META snapshot — EXPLICIT paths (one
    * driver listStatus per committed batch), exposed package-private
    * so the spec can assert the pruning contract on the literal path
    * set. Takes the caller's snapshot: a probe reads `_meta` once
    * and threads it, so a concurrent append/drop can never show it a
    * torn view.
    */
  private[graft] def prunedCellPaths(spark: SparkSession, path: String,
                                     meta: VecMeta,
                                     cells: Seq[Long]): Seq[String] = {
    val fs = fsFor(spark, path)
    val wanted = cells.map(c => s"cell=$c").toSet
    meta.batches.flatMap { bid =>
      val cc = new org.apache.hadoop.fs.Path(
        s"$path/batches/$bid/cellCodes")
      if (!fs.exists(cc)) Seq.empty
      else fs.listStatus(cc)
        .filter(st => st.isDirectory && wanted(st.getPath.getName))
        .map(_.getPath.toString).toSeq
    }
  }

  /** Convenience form for callers without a snapshot in hand (specs,
    * one-off tooling): reads the meta itself, then delegates.
    */
  private[graft] def prunedCellPaths(spark: SparkSession, path: String,
                                     cells: Seq[Long]): Seq[String] =
    prunedCellPaths(spark, path, readMeta(spark, path), cells)

  /** The queries' probed cells, resolved driver-side: |queries|·nprobe
    * rows — the bounded "query router" scalar of a real serving tier.
    */
  private[graft] def probedCells(queries: DataFrame, idCol: String,
                                 vecCol: String, centroids: DataFrame,
                                 nprobe: Int): Seq[Long] = {
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("qdist").desc, col("cell"))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .withColumn("qdist", Similarity.cosine(col("qv"), col("centv")))
      .withColumn("r", row_number().over(probeW))
      .filter(col("r") <= nprobe)
      .select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
  }

  /** Remove one COMMITTED batch — the executable repair for a batch
    * ingested with bad embeddings (re-encode and re-append it after;
    * a dropped id does NOT join the retired list, so the re-append is
    * allowed). The meta swap commits FIRST, then the directory
    * deletes: a crash between the two leaves an invisible orphan that
    * the next publish of the same content reclaims — a reprobe serves
    * the pre-drop or post-drop view, never a torn one. An IN-FLIGHT
    * probe that resolved this batch's cell paths under the pre-drop
    * snapshot fails loudly if the delete races its read (fail-closed,
    * never a wrong ranking); retry, or set `retainMs > 0`: the
    * delisted directory then stays in place (invisible — probes are
    * meta-driven) for at least that grace window, recorded under
    * `_pending_delete/` and reclaimed by a later maintenance call's
    * sweep ([[IndexProtocol.sweepPendingDeletes]]). Returns false if
    * the batch was not committed.
    */
  def dropBatch(spark: SparkSession, path: String,
                batchId: String, retainMs: Long = 0L): Boolean = {
    val fs = fsFor(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_staging/$batchId"),
      true)
    val (meta, raw) = readMetaRaw(spark, path)
    if (!meta.batches.contains(batchId)) false
    else {
      swapMeta(fs, path,
        meta.copy(batches = meta.batches.filterNot(_ == batchId)), raw)
      val now = System.currentTimeMillis()
      // THIS drop is the delist event: reset (clear + mark) so a
      // stale publish-race marker cannot pre-empt the promised window
      IndexProtocol.resetPendingDelete(fs, path, batchId, now, retainMs)
      // rail the sweep on the CURRENT committed list (re-read after
      // the swap), never the pre-swap snapshot: a batch committed by
      // a racing append between the swap and this sweep must survive
      IndexProtocol.sweepPendingDeletes(fs, path, now,
        IndexProtocol.committedFromMeta(fs, path))
      true
    }
  }

  /** DOC-LEVEL RETRACTION (the takedown/opt-out path, R1 — the
    * [[Bm25.retractFromBm25Index]] twin for vectors): physically
    * remove `ids`' codes from every listed batch. Affected batches'
    * remainder codes republish as fresh cell-partitioned batch
    * directories (atomic rename, invisible until the swap), then ONE
    * compare-and-set meta swap replaces the affected ids and RETIRES
    * the originals, so a redelivered embedding batch is still refused
    * instead of resurrecting the retracted vectors. Old directories
    * delete after the swap (or linger invisibly for `retainMs`, the
    * [[dropBatch]] grace contract). The meta carries no corpus
    * scalars, so the swap is pure list surgery. Returns the number of
    * distinct retracted ids found (0 = meta untouched).
    */
  def retractIds(spark: SparkSession, path: String, ids: Seq[Any],
                 retainMs: Long = 0L): Long = {
    require(ids.nonEmpty, "retractIds needs at least one id")
    val fs = fsFor(spark, path)
    val (meta, raw) = readMetaRaw(spark, path)
    import spark.implicits._
    final case class Rewrite(old: String, replacement: Option[String],
                             dn: Long)
    val rewrites = meta.batches.flatMap { b =>
      val cc = new org.apache.hadoop.fs.Path(
        s"$path/batches/$b/cellCodes")
      if (!fs.exists(cc)) None
      else {
        val rows = spark.read.parquet(cc.toString)
        val idsDf = ids.map(_.toString).toDF("__rid")
          .select(col("__rid").cast(rows.schema("id").dataType)
            .as("id")).distinct()
        val dn = rows.join(broadcast(idsDf), Seq("id"), "left_semi")
          .select(col("id")).distinct().count()
        if (dn == 0L) None
        else {
          val remainder = rows.join(broadcast(idsDf), Seq("id"),
            "left_anti")
          val replacement =
            if (remainder.isEmpty) None
            else {
              val rid = "r" + java.security.MessageDigest
                .getInstance("SHA-256")
                .digest((b + ":" + ids.map(_.toString).sorted
                  .mkString(",")).getBytes("UTF-8"))
                .take(8).map("%02x".format(_)).mkString
              val stagingRoot = new org.apache.hadoop.fs.Path(
                s"$path/_staging/$rid")
              val target = new org.apache.hadoop.fs.Path(
                s"$path/batches/$rid")
              if (fs.exists(stagingRoot) && !fs.delete(stagingRoot, true))
                throw new IllegalStateException(
                  s"cannot wipe stale staging at $stagingRoot")
              if (fs.exists(target) && !fs.delete(target, true))
                throw new IllegalStateException(
                  s"cannot reclaim crash residue at $target")
              remainder.write.mode("overwrite").partitionBy("cell")
                .parquet(new org.apache.hadoop.fs.Path(stagingRoot,
                  "cellCodes").toString)
              fs.mkdirs(target.getParent)
              require(fs.rename(stagingRoot, target),
                s"atomic publish of rewritten batch $rid failed")
              Some(rid)
            }
          Some(Rewrite(b, replacement, dn))
        }
      }
    }
    if (rewrites.isEmpty) return 0L
    val byOld = rewrites.map(r => r.old -> r).toMap
    val newBatches = meta.batches.flatMap {
      case b if byOld.contains(b) => byOld(b).replacement.toSeq
      case b                      => Seq(b)
    }
    swapMeta(fs, path, meta.copy(batches = newBatches,
      retired = (meta.retired ++ rewrites.map(_.old)).distinct), raw)
    val now = System.currentTimeMillis()
    rewrites.foreach(r =>
      IndexProtocol.resetPendingDelete(fs, path, r.old, now, retainMs))
    IndexProtocol.sweepPendingDeletes(fs, path, now,
      IndexProtocol.committedFromMeta(fs, path))
    rewrites.map(_.dn).sum
  }

  /** Index MAINTENANCE: merge every committed batch's codes into ONE
    * batch directory — the compaction a years-lived daily ingest
    * eventually needs (file and directory counts grow one batch per
    * day). Correctness-preserving by construction: probes read the
    * same (id, cell, subspace, code) row set afterwards.
    *
    * The REPLAY CONTRACT survives compaction: superseded batch ids
    * move to the meta's `retired` list, so [[append]] refuses their
    * re-submission exactly as before — and the superseded
    * DIRECTORIES delete outright, or after the `retainMs` grace
    * window (see [[dropBatch]]). The retired list is CAPPED at
    * `maxRetired` ids, newest kept ([[Bm25.compactBm25Index]]'s
    * rationale: bounded meta on the O(1) replay-guard path; the
    * trade-off — a batch retired more than `maxRetired` retirements
    * ago could be re-appended unrefused — is sized to the stream's
    * redelivery horizon, not the corpus).
    *
    * The merged batch id derives from the SORTED COMMITTED LIST
    * ([[IndexProtocol.mergedId]] — the [[Bm25.compactBm25Index]]
    * scheme), NOT from the content id set: a content-derived id can
    * collide with a committed batch that happens to carry the full id
    * set (double-ingest, or a corrected re-ingest under a new id),
    * and the collision would skip the merge while the sweep deleted
    * the other batches' rows — the serve would change with no error.
    * The list-derived space is disjoint from append ids by
    * construction (reserved shape, refused at append), a single
    * committed batch is a no-op, and crash re-runs recompute the same
    * id so residue is reclaimed.
    *
    * Crash honesty, stage by stage: merged batch publishes first
    * (atomic rename, invisible — unlisted); the meta swap flips
    * visibility to exactly [cid] atomically; only then do superseded
    * dirs retire. A crash before the swap re-runs cleanly; a crash
    * after it leaves invisible orphan dirs that the post-swap sweep
    * of any later compaction removes. At no point can a probe see a
    * torn view. SINGLE MAINTAINER contract (all three indexes):
    * compact/drop and the append/streaming ingest are one logical
    * writer — run maintenance in the same scheduler slot as ingest,
    * never concurrently; and since r10 that contract is ENFORCED: the
    * meta swap is compare-and-set against the bytes this compaction
    * read, so a batch committed between the read and the swap fails
    * the compaction loudly ([[graft.sources.MetaSwap.CasFailed]])
    * with the appended batch intact — the merged directory is
    * unlisted residue, reclaimed by the re-run. Entry runs the A6d
    * audit as a PRE-FLIGHT ([[IndexProtocol.preflightCompaction]]):
    * a committed batch with lost payload refuses the compaction
    * (typed [[graft.IndexUnhealthy]] — merging would bake the loss in
    * permanently) and a lost current-gen snapshot record is re-recorded
    * while the meta bytes still exist. Returns the merged batch's id.
    */
  def compact(spark: SparkSession, path: String, retainMs: Long = 0L,
              maxRetired: Int = 512): String =
    compactImpl(spark, path, retainMs, maxRetired, () => ())

  /** [[compact]] with two test seams: `beforeSwap` runs between the
    * merged batch's publish and the meta swap — the window the CAS
    * exists to defend — so the interleaved-append spec can prove the
    * compaction fails loudly instead of delisting the newcomer; and
    * `beforeSweep` runs between the committed swap and the retire
    * sweep, so the sweep-rail spec can prove a batch committed in
    * THAT window survives with its directory intact.
    */
  private[graft] def compactImpl(spark: SparkSession, path: String,
                                 retainMs: Long, maxRetired: Int,
                                 beforeSwap: () => Unit,
                                 beforeSweep: () => Unit = () => ())
      : String = {
    require(maxRetired >= 1, s"maxRetired must be >= 1, got $maxRetired")
    val fs = fsFor(spark, path)
    val (meta, raw) = readMetaRaw(spark, path)
    require(meta.batches.nonEmpty,
      s"no committed batches to compact at $path")
    // diagnose BEFORE destroying (the A6d audit at maintenance entry):
    // refuse on a committed batch with lost payload — merging would
    // bake the loss in and retire the evidence — and re-record a lost
    // current-gen snapshot record while the meta bytes still exist
    IndexProtocol.preflightCompaction(fs, path)
    // a marker on a COMMITTED batch is by definition stale (see
    // IndexProtocol.clearStaleMarkers) — clear them now so no stale
    // clock survives a crash-recovery path into these batches'
    // eventual retirement and truncates the window promised there
    val cleared = IndexProtocol.clearStaleMarkers(fs, path, meta.batches)
    // if OUR swap loses the CAS, a marker cleared above may have been
    // a concurrent drop's promised window (delisted between the
    // re-read and the clear) — restore it before failing, so the
    // losing compaction cannot erase the winner's grace promise
    def swapRestoring(m: VecMeta): Unit =
      try swapMeta(fs, path, m, raw)
      catch {
        case e: graft.sources.MetaSwap.CasFailed =>
          IndexProtocol.restorePendingDeletes(fs, path, cleared)
          throw e
      }
    def retireAllBut(keep: String): Unit = {
      beforeSweep()
      val now = System.currentTimeMillis()
      // the rail is the CURRENT lists, re-read AFTER this compaction's
      // swap: the pre-swap snapshot is stale here — an append that
      // read the post-swap meta and CAS-committed before this sweep
      // is only on the re-read list, and marking or sweeping its
      // directory would be data loss with the batch still committed
      // (the r10 finding)
      val (current, curRetired) = IndexProtocol.listsFromMeta(fs, path)
      val superseded = meta.batches.toSet
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/batches"))
        .filter(st => st.isDirectory && st.getPath.getName != keep &&
          !current(st.getPath.getName))
        .foreach { st =>
          val bid = st.getPath.getName
          // classification: a dir this compaction delisted, a
          // currently-retired id, or merged-shape residue is
          // unambiguous superseded payload → caller's retainMs. Any
          // OTHER unlisted append-shaped dir may be an in-flight
          // publish whose CAS hasn't run — reclaiming it immediately
          // would leave that append committed and payload-less, so it
          // gets the orphan-grace floor (true crash residue reclaims
          // after the floor, or sooner via a re-publish)
          val grace =
            if (superseded(bid) || curRetired(bid) ||
              IndexProtocol.isMergedShape(bid)) retainMs
            else math.max(retainMs, IndexProtocol.OrphanGraceMs)
          // no stale-marker hazard here: markers on this run's
          // committed list were cleared at compaction entry, so
          // first-marker-wins only ever preserves a RUNNING clock
          // (e.g. a prior crashed compaction's retirement window)
          IndexProtocol.markPendingDelete(fs, path, bid, now, grace)
        }
      IndexProtocol.sweepPendingDeletes(fs, path, now,
        IndexProtocol.committedFromMeta(fs, path))
      ()
    }
    if (meta.batches.size == 1) {
      // already compact — but a crash between a PRIOR compaction's
      // meta swap and its sweep leaves invisible orphan dirs, and
      // this re-run is the documented recovery. The no-op still
      // CAS-swaps the UNCHANGED meta first: a concurrent append
      // landing since this call's read fails the swap loudly instead
      // of having its published-but-not-yet-committed directory swept
      // out from under its commit
      beforeSwap()
      swapRestoring(meta)
      retireAllBut(meta.batches.head)
      return meta.batches.head
    }
    val dirs = meta.batches.map(b =>
      new org.apache.hadoop.fs.Path(s"$path/batches/$b"))
    val all = dirs.flatMap { b =>
      val cc = new org.apache.hadoop.fs.Path(b, "cellCodes")
      if (!fs.exists(cc)) Seq.empty
      else fs.listStatus(cc).filter(_.isDirectory).map(_.getPath)
    }
    require(all.nonEmpty, s"no code partitions to compact at $path")
    // the exact-row dedup mirrors the probe's read-side discipline
    // (topK dropDuplicates the same four columns), so the merged batch
    // serves bit-identically — including under double-ingest, where
    // the duplicate codes were already invisible to scoring
    val codes = all
      .groupBy(p => p.getName.stripPrefix("cell=").toLong)
      .map { case (c, ps) =>
        spark.read.parquet(ps.map(_.toString): _*)
          .withColumn("cell", lit(c))
      }.reduce(_.unionByName(_))
      .dropDuplicates("id", "subspace", "code", "cell")
    val cid = IndexProtocol.mergedId(meta.batches)
    // the shape is reserved at append time, so a collision can only
    // come from an index predating that guard — refuse (typed, the
    // append-side twin's ReservedIdRefused) rather than destroy the
    // committed batch's payload and rebuild over it
    if (meta.batches.contains(cid) || meta.retired.contains(cid))
      throw new graft.ReservedIdRefused(
        s"merged id $cid is already on the committed/retired list at " +
          s"$path — a pre-reservation user-supplied id squats on the " +
          "merged shape; drop and re-ingest that batch under another " +
          "id before compacting")
    // the retired list is CAPPED, so a pre-reservation squatter that
    // aged off it evades the list check — but a dropped squatter
    // inside its grace window still has a pending-delete marker, and
    // rebuilding over its directory would cut the promised window
    // short; refuse while the window is open (a marker for a merged
    // id cannot be this compaction's own residue: markers are only
    // written post-swap, and post-swap the list is [cid] whose
    // mergedId differs). An EXPIRED or unreadable marker is exactly
    // what the sweep would reclaim — reclaim it here so a stale
    // marker can never wedge every future compaction
    IndexProtocol.pendingDeadline(fs, path, cid) match {
      case Some(d) if d > System.currentTimeMillis() =>
        throw new graft.ReservedIdRefused(
          s"merged id $cid has a pending grace-period delete at " +
            s"$path — a delisted pre-reservation batch still inside " +
            "its retain window squats on the merged shape; wait for " +
            "the window to expire (or clear the marker explicitly) " +
            "before compacting")
      case _ => IndexProtocol.clearPendingDelete(fs, path, cid)
    }
    val merged = new org.apache.hadoop.fs.Path(s"$path/batches/$cid")
    // residue from a crashed earlier compaction of the SAME list is
    // safe to rebuild wholesale — it was never committed
    if (fs.exists(merged) && !fs.delete(merged, true))
      throw new IllegalStateException(
        s"cannot reclaim crashed-compaction residue at $merged — " +
          "refusing to rename into an existing directory")
    val staging = new org.apache.hadoop.fs.Path(s"$path/_staging/$cid")
    // verified wipe — the write below refreshes only the cellCodes
    // child of the rename source (publishBatch's rationale)
    if (fs.exists(staging) && !fs.delete(staging, true))
      throw new IllegalStateException(
        s"cannot wipe stale compaction staging at $staging")
    // DEFRAGMENT, not just merge (the compactBm25Index rationale):
    // cluster rows by cell before the write so each cell dir
    // lands as ~one file instead of one per (task × cell)
    codes.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(new org.apache.hadoop.fs.Path(staging, "cellCodes")
        .toString)
    if (!fs.rename(staging, merged))
      throw new IllegalStateException(
        s"cannot publish compacted batch $staging to $merged")
    beforeSwap()
    swapRestoring(meta.copy(batches = Seq(cid),
      retired =
        (meta.retired ++ meta.batches).distinct.takeRight(maxRetired)))
    // retire every batch dir off the committed list: superseded
    // payloads AND any invisible orphans a prior crash left behind
    retireAllBut(cid)
    cid
  }

  // ---- zero-downtime republish: the serving pointer --------------

  /** Point the serving tier at an index root with one effectively
    * atomic swap — the retrain→reindex flow: train new artifacts,
    * [[write]] a complete index under a FRESH path, then redirect the
    * pointer. In-flight probes finish against the root they already
    * resolved; every later [[resolvePointer]] sees the new one; the
    * superseded root is dropped after a grace period. The swap is the
    * `_meta.next` protocol: stage `<pointer>.next`, delete, rename —
    * a crash mid-swap self-heals on the next resolve.
    */
  def writePointer(spark: SparkSession, pointerPath: String,
                   indexRoot: String): Unit = {
    val fs = fsFor(spark, pointerPath)
    // refuse to point at a root no probe could serve
    readMeta(spark, indexRoot)
    graft.sources.MetaSwap.swap(fs,
      new org.apache.hadoop.fs.Path(pointerPath),
      s"$indexRoot\n".getBytes("UTF-8"))
  }

  /** Resolve the active index root; self-heals a crashed swap. */
  def resolvePointer(spark: SparkSession,
                     pointerPath: String): String = {
    val fs = fsFor(spark, pointerPath)
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    graft.sources.MetaSwap.heal(fs, p)
    require(fs.exists(p),
      s"no serving pointer at $pointerPath — publish one with " +
        "VectorIndex.writePointer")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .next().trim
    finally in.close()
  }

  /** The pointer-resolved serve — what a serving tier actually calls,
    * so republishing an index never interrupts it.
    */
  def topKVia(spark: SparkSession, pointerPath: String, emb: DataFrame,
              idCol: String, vecCol: String,
              queryPred: org.apache.spark.sql.Column,
              k: Int = 10, nprobe: Int = 2,
              rerank: Int = 50): DataFrame =
    topK(spark, resolvePointer(spark, pointerPath), emb, idCol, vecCol,
      queryPred, k, nprobe, rerank)

  /** The full indexed serve: route queries to cells driver-side, read
    * ONLY those cells' code partitions (across the committed batches)
    * by explicit path, cell-local ADC shortlist, exact re-rank
    * against the vector table. Results are bit-identical to the
    * in-memory [[Similarity.ivfpqTopKReranked]] over the same
    * artifacts — the index changes where codes come from, never the
    * arithmetic. That includes the empty edge: a healthy sparse index
    * whose probed cells all happen to be memberless (partitionBy
    * writes no directory for them) returns the EMPTY result in the
    * scored schema, exactly as the in-memory form does — only an
    * index with no committed batches at all refuses loudly.
    *
    * `emb` is the vector table stage 2 re-ranks from (the serving
    * tier's vector store); only shortlisted ids are touched, by
    * equi-join.
    */
  def topK(spark: SparkSession, path: String, emb: DataFrame,
           idCol: String, vecCol: String,
           queryPred: org.apache.spark.sql.Column,
           k: Int = 10, nprobe: Int = 2, rerank: Int = 50): DataFrame = {
    // ONE meta read per probe: the same snapshot supplies geometry
    // and the visibility list, torn-free under concurrent maintenance
    serveWithMeta(spark, path, readMeta(spark, path), emb, idCol,
      vecCol, queryPred, k, nprobe, rerank)
  }

  /** The live index's current committed generation — what a reader
    * records alongside derived artifacts so [[topKAt]] can later
    * reproduce exactly the view those artifacts were computed from.
    */
  def currentGen(spark: SparkSession, path: String): Long =
    readMeta(spark, path).gen

  /** AS-OF-GENERATION serve (snapshot read): probe the index exactly
    * as it was at committed generation `gen` — the Iceberg-style
    * time-travel read restated on the batch-directory layout. The
    * snapshot's committed list comes from the `_meta_history` record
    * the swap at `gen` wrote; physical servability is bounded by
    * retention — a batch RETIRED after `gen` stays on disk (and this
    * probe stays answerable) only within its grace window
    * (`retainMs`), so snapshots are a bounded window by design, not
    * an unbounded log. A missing history record or a reclaimed batch
    * directory refuses with the typed [[graft.SnapshotUnavailable]]
    * so a reader can fall back to the live serve without message
    * matching. The serve arithmetic is [[topK]]'s, bit-identical —
    * only the visibility list differs.
    */
  def topKAt(spark: SparkSession, path: String, gen: Long,
             emb: DataFrame, idCol: String, vecCol: String,
             queryPred: org.apache.spark.sql.Column,
             k: Int = 10, nprobe: Int = 2, rerank: Int = 50): DataFrame = {
    val fs = fsFor(spark, path)
    val raw = IndexProtocol.readMetaHistory(fs, path, gen).getOrElse {
      throw new graft.SnapshotUnavailable(
        s"vector index at $path has no snapshot record for gen $gen " +
          "— the gen never committed, crashed before recording, or " +
          "aged past the history cap; probe the live index instead")
    }
    val meta = parseVecMeta(raw, path)
    val missing = meta.batches.filterNot(b =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/batches/$b")))
    if (missing.nonEmpty) throw new graft.SnapshotUnavailable(
      s"snapshot gen $gen of the vector index at $path is no longer " +
        s"servable: batch dir(s) ${missing.mkString(", ")} were " +
        "retired and physically reclaimed (grace expired) — " +
        "snapshots outlive maintenance only within retainMs")
    serveWithMeta(spark, path, meta, emb, idCol, vecCol, queryPred,
      k, nprobe, rerank)
  }

  private def serveWithMeta(spark: SparkSession, path: String,
                            meta: VecMeta, emb: DataFrame,
                            idCol: String, vecCol: String,
                            queryPred: org.apache.spark.sql.Column,
                            k: Int, nprobe: Int,
                            rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank width $rerank must cover k=$k")
    require(meta.batches.nonEmpty,
      s"vector index at $path has no committed batches — everything " +
        "was dropped; append or rebuild before serving")
    val centroids = spark.read.parquet(s"$path/centroids")
    val codebook = spark.read.parquet(s"$path/codebook")
    val queries = emb.filter(queryPred)
    val cells = probedCells(queries, idCol, vecCol, centroids, nprobe)
    val paths = prunedCellPaths(spark, path, meta, cells)
    if (paths.isEmpty) {
      // every probed cell is memberless: the scored schema's empty
      // result (names AND types as a non-empty serve), the same
      // contract as the BM25 probe's absent-terms branch
      val idT = emb.schema(idCol).dataType
      return emb.sparkSession.emptyDataFrame
        .withColumn("query_id", lit(null).cast(idT))
        .withColumn("cand_id", lit(null).cast(idT))
        .withColumn("rank", lit(null).cast("bigint"))
        .withColumn("cos_sim", lit(null).cast("double"))
        .filter(lit(false))
    }
    // one scan relation per probed CELL (its directories across all
    // batches union in a single read); the partition-encoded cell
    // value is recovered from the directory name, so no
    // basePath-wide discovery runs — plan size is bounded by the
    // probed-cell count, not the batch count. The exact-row
    // dropDuplicates is defense in depth on probed-cells-sized data:
    // an intentional re-ingest of identical content under a new
    // batch id must not double the ADC partial sums (the dedup
    // index's dedupe-on-read discipline)
    val cellCodes = paths
      .groupBy(p => p.substring(p.lastIndexOf("cell=") + 5).toLong)
      .map { case (c, ps) =>
        spark.read.parquet(ps: _*).withColumn("cell", lit(c))
      }.reduce(_.unionByName(_))
      .dropDuplicates("id", "subspace", "code", "cell")
    Similarity.pqRerank(emb, idCol, vecCol, queryPred,
      Similarity.ivfpqShortlist(queries, idCol, vecCol, centroids,
        cellCodes, codebook, meta.m, meta.dim, rerank, nprobe), k)
  }
}
