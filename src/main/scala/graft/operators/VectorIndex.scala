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
  *     _meta                   (m, dim)             — commit marker
  *
  * The training artifacts (centroids from [[Similarity.kmeansIterate]]
  * or any quantizer, codebook from [[Similarity.pqTrain]]) are INPUTS:
  * the write assembles and lays out, it never trains — re-index and
  * re-train stay independently schedulable, the same separation the
  * reference keeps between derivation and load jobs
  * (silver_to_gold.py:23 vs bigquery.py:105).
  *
  * INCREMENTAL ingest is the D8b batch protocol verbatim: [[append]]
  * encodes a new batch with the STORED artifacts (standard IVF
  * behavior — appending never retrains; retrain-and-reindex is a
  * separate scheduled rebuild), stages it under `_staging/<bid>`, and
  * publishes with one atomic directory rename. A batch id that
  * already has a published directory is refused loudly (O(1) probe),
  * so redelivered embedding batches cannot double-count candidates.
  *
  * Serve cost: a probe resolves its queries' probed cells DRIVER-side
  * (|queries|·nprobe rows — the "query router" of a real vector DB),
  * opens only those `cell=<c>` partition directories across the
  * published batches by explicit path, and runs the cell-local ADC +
  * exact re-rank of [[Similarity.ivfpqShortlist]]/
  * [[Similarity.pqRerank]] over them. Scanned input ∝ probed cells,
  * never the corpus.
  *
  * Commit protocol: tables first, `_meta` LAST (the
  * [[Bm25.writeBm25Index]] marker discipline) — a crash mid-build
  * leaves a directory every probe refuses loudly.
  */
object VectorIndex {

  private def fsFor(spark: SparkSession,
                    path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_meta")

  private[graft] def readMeta(spark: SparkSession,
                              path: String): (Int, Int) = {
    val fs = fsFor(spark, path)
    val p = metaPath(path)
    require(fs.exists(p),
      s"no committed vector index at $path (missing _meta — " +
        "half-built index or wrong path); build one with " +
        "VectorIndex.write")
    val in = fs.open(p)
    try {
      val kv = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.split("=", 2)).collect {
          case Array(a, b) => a -> b
        }.toMap
      (kv("m").toInt, kv("dim").toInt)
    } finally in.close()
  }

  /** Published batch directories under the index root. */
  private def batchDirs(fs: org.apache.hadoop.fs.FileSystem,
                        path: String): Seq[org.apache.hadoop.fs.Path] = {
    val base = new org.apache.hadoop.fs.Path(s"$path/batches")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).filter(_.isDirectory).map(_.getPath).toSeq
  }

  /** Stage a batch's cell-partitioned codes and publish them with one
    * atomic rename; loud O(1) refusal of an already-published batch
    * id (the [[Dedup.writeDedupIndex]] replay guard).
    */
  private def publishBatch(emb: DataFrame, idCol: String,
                           vecCol: String, centroids: DataFrame,
                           codebook: DataFrame, m: Int, dim: Int,
                           path: String, bid: String): Unit = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    val target = new org.apache.hadoop.fs.Path(s"$path/batches/$bid")
    require(!fs.exists(target),
      s"VectorIndex append refused: batch $bid is already published " +
        s"at $target — a replayed embedding batch would double-count " +
        "every candidate it carries; drop the stale directory first " +
        "if this is an intentional re-ingest")
    // clear any crashed prior stage wholesale before re-staging, so
    // residue files can never ride the rename into the live index
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_staging/$bid"),
      true)
    val staging = new org.apache.hadoop.fs.Path(
      s"$path/_staging/$bid/cellCodes")
    Similarity.pqEncodeCells(emb, idCol, vecCol, centroids, codebook,
        m, dim)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(staging.toString)
    fs.mkdirs(target.getParent)
    require(fs.rename(staging.getParent, target),
      s"atomic publish of batch $bid failed (staging → $target)")
  }

  /** Assemble and publish the index from its trained artifacts; the
    * initial corpus lands as batch `bootstrap`.
    */
  def write(emb: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, codebook: DataFrame,
            m: Int, dim: Int, path: String): Unit = {
    val spark = emb.sparkSession
    val fs = fsFor(spark, path)
    fs.delete(metaPath(path), false)
    centroids.select(col("cell"), col("centv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    codebook.select(col("subspace"), col("code"), col("centv"))
      .write.mode("overwrite").parquet(s"$path/codebook")
    publishBatch(emb, idCol, vecCol, centroids, codebook, m, dim,
      path, "bootstrap")
    val out = fs.create(metaPath(path), true)
    try out.write(s"m=$m\ndim=$dim\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Daily dense ingest: encode `emb` with the STORED artifacts and
    * publish it as one atomic batch directory. Never retrains, never
    * touches existing batches — `mode = "append"` in the reference's
    * warehouse sense (bigquery.py:141). Returns the published batch
    * id (content-derived from the batch's id set unless supplied).
    */
  def append(emb: DataFrame, idCol: String, vecCol: String,
             path: String, batchId: Option[String] = None): String = {
    val spark = emb.sparkSession
    val (m, dim) = readMeta(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
    val codebook = spark.read.parquet(s"$path/codebook")
    val bid = batchId.getOrElse(Dedup.batchId(emb, idCol))
    // a supplied id becomes a directory name; content-derived ids are
    // hex, but a caller's id must not smuggle separators or the
    // cell= marker the probe's path parser keys on
    require(bid.matches("[A-Za-z0-9._-]+"),
      s"batch id '$bid' must be a path-safe token " +
        "([A-Za-z0-9._-] only)")
    publishBatch(emb, idCol, vecCol, centroids, codebook, m, dim,
      path, bid)
    bid
  }

  /** The `cell=<c>` partition directories matching `cells`, across
    * every published batch — EXPLICIT paths (one driver listStatus
    * per batch dir), exposed package-private so the spec can assert
    * the pruning contract on the literal path set.
    */
  private[graft] def prunedCellPaths(spark: SparkSession, path: String,
                                     cells: Seq[Long]): Seq[String] = {
    val fs = fsFor(spark, path)
    val wanted = cells.map(c => s"cell=$c").toSet
    batchDirs(fs, path).flatMap { b =>
      val cc = new org.apache.hadoop.fs.Path(b, "cellCodes")
      if (!fs.exists(cc)) Seq.empty
      else fs.listStatus(cc)
        .filter(st => st.isDirectory && wanted(st.getPath.getName))
        .map(_.getPath.toString).toSeq
    }
  }

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

  /** Remove one published batch — the executable repair for a batch
    * ingested with bad embeddings (re-encode and re-append it after).
    * Returns true if the batch existed.
    */
  def dropBatch(spark: SparkSession, path: String,
                batchId: String): Boolean = {
    val fs = fsFor(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_staging/$batchId"),
      true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batches/$batchId"),
      true)
  }

  /** Index MAINTENANCE: merge every published batch's codes into ONE
    * batch directory — the compaction a years-lived daily ingest
    * eventually needs (file and directory counts grow one batch per
    * day). Correctness-preserving by construction: probes read the
    * same (id, cell, subspace, code) row set afterwards.
    *
    * The REPLAY CONTRACT survives compaction: superseded batch
    * directories are kept as payload-free tombstones, so [[append]]
    * refuses re-submissions exactly as before, and
    * [[prunedCellPaths]] already skips directories without a
    * `cellCodes` table, so tombstones cost nothing at read time.
    *
    * Crash honesty: the merged batch publishes first (atomic
    * rename), then old payloads delete. A crash between the two
    * leaves exact-duplicate code rows visible — which [[topK]]'s
    * read-side dropDuplicates already tolerates, so the residue
    * degrades performance, never scores; re-run the compaction to
    * finish the cleanup. Returns the merged batch's id.
    */
  def compact(spark: SparkSession, path: String): String = {
    val fs = fsFor(spark, path)
    val dirs = batchDirs(fs, path)
    require(dirs.nonEmpty, s"no published batches to compact at $path")
    val all = dirs.flatMap { b =>
      val cc = new org.apache.hadoop.fs.Path(b, "cellCodes")
      if (!fs.exists(cc)) Seq.empty
      else fs.listStatus(cc).filter(_.isDirectory).map(_.getPath)
    }
    require(all.nonEmpty, s"no code partitions to compact at $path")
    val codes = all
      .groupBy(p => p.getName.stripPrefix("cell=").toLong)
      .map { case (c, ps) =>
        spark.read.parquet(ps.map(_.toString): _*)
          .withColumn("cell", lit(c))
      }.reduce(_.unionByName(_))
      .dropDuplicates("id", "subspace", "code", "cell")
    val cid = Dedup.batchId(codes.select("id").distinct(), "id")
    val merged = new org.apache.hadoop.fs.Path(s"$path/batches/$cid")
    if (!fs.exists(merged)) {
      val staging = new org.apache.hadoop.fs.Path(
        s"$path/_staging/$cid")
      fs.delete(staging, true)
      codes.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$staging/cellCodes")
      if (!fs.rename(staging, merged)) throw new IllegalStateException(
        s"cannot publish compacted batch $staging to $merged")
    }
    // tombstone the superseded batches: drop payloads, keep the
    // directory so replay refusal is unchanged
    batchDirs(fs, path).filter(_.getName != cid).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(b, "cellCodes"), true); ()
    }
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
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    val next = new org.apache.hadoop.fs.Path(s"$pointerPath.next")
    val out = fs.create(next, true)
    try out.write(s"$indexRoot\n".getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    require(fs.rename(next, p),
      s"pointer swap failed: $next -> $p")
  }

  /** Resolve the active index root; self-heals a crashed swap. */
  def resolvePointer(spark: SparkSession,
                     pointerPath: String): String = {
    val fs = fsFor(spark, pointerPath)
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    val next = new org.apache.hadoop.fs.Path(s"$pointerPath.next")
    if (!fs.exists(p) && fs.exists(next)) fs.rename(next, p)
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
    * ONLY those cells' code partitions (across all published batches)
    * by explicit path, cell-local ADC shortlist, exact re-rank
    * against the vector table. Results are bit-identical to the
    * in-memory [[Similarity.ivfpqTopKReranked]] over the same
    * artifacts — the index changes where codes come from, never the
    * arithmetic.
    *
    * `emb` is the vector table stage 2 re-ranks from (the serving
    * tier's vector store); only shortlisted ids are touched, by
    * equi-join.
    */
  def topK(spark: SparkSession, path: String, emb: DataFrame,
           idCol: String, vecCol: String,
           queryPred: org.apache.spark.sql.Column,
           k: Int = 10, nprobe: Int = 2, rerank: Int = 50): DataFrame = {
    require(rerank >= k, s"rerank width $rerank must cover k=$k")
    val (m, dim) = readMeta(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
    val codebook = spark.read.parquet(s"$path/codebook")
    val queries = emb.filter(queryPred)
    val cells = probedCells(queries, idCol, vecCol, centroids, nprobe)
    val paths = prunedCellPaths(spark, path, cells)
    require(paths.nonEmpty,
      s"vector index at $path has no partitions for probed cells " +
        s"$cells — empty index or cell scheme drift")
    // one scan relation per probed CELL (its directories across all
    // batches union in a single read); the partition-encoded cell
    // value is recovered from the directory name, so no
    // basePath-wide discovery runs — plan size is bounded by the
    // probed-cell count, not the batch count. The exact-row
    // dropDuplicates is defense in depth on probed-cells-sized data:
    // a crash inside [[compact]]'s publish-then-delete window leaves
    // exact-duplicate code rows visible, which would otherwise
    // double the ADC partial sums (the dedup index's
    // dedupe-on-read discipline)
    val cellCodes = paths
      .groupBy(p => p.substring(p.lastIndexOf("cell=") + 5).toLong)
      .map { case (c, ps) =>
        spark.read.parquet(ps: _*).withColumn("cell", lit(c))
      }.reduce(_.unionByName(_))
      .dropDuplicates("id", "subspace", "code", "cell")
    Similarity.pqRerank(emb, idCol, vecCol, queryPred,
      Similarity.ivfpqShortlist(queries, idCol, vecCol, centroids,
        cellCodes, codebook, m, dim, rerank, nprobe), k)
  }
}
