package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bm25, IndexProtocol, Similarity, VectorIndex}
import graft.sources.Tables

/** Adversarial specs for the AS-OF-GENERATION snapshot probes
  * (VectorIndex.topKAt, Bm25.bm25TopKIndexedAt, the `_meta_history`
  * log behind them). The contract under test:
  *
  *  - a probe at gen g reproduces BIT-FOR-BIT the serve a live probe
  *    computed while g was the committed view — visibility list AND
  *    (for BM25) the N/Σlen scalars both come from the snapshot;
  *  - snapshots are a BOUNDED window, not a time-travel log: the
  *    history cap ages records out and batch-dir retention bounds
  *    physical servability — past either bound the probe refuses
  *    with the typed [[SnapshotUnavailable]], never serves a wrong
  *    or partial ranking;
  *  - the history record is written AFTER the meta swap and never
  *    participates in the CAS: a crash (or lost record) between swap
  *    and record leaves the LIVE index fully intact — a gen can
  *    become unprobeable, it can never un-commit.
  */
class SnapshotProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val (m, dim) = (4, 64)
  private lazy val emb =
    Tables.table(spark, sf, "embeddings").localCheckpoint()
  private lazy val cents = emb.filter(col("vec_id") % 37 === 1)
    .select(col("vec_id").as("cell"), col("embedding").as("centv"))
    .localCheckpoint()
  private lazy val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
    m, dim, col("vec_id") % 17 === 5, rounds = 1).localCheckpoint()
  private val qp = col("vec_id") % 50 === 0

  private def vecServeLive(path: String): Set[org.apache.spark.sql.Row] =
    VectorIndex.topK(spark, path, emb, "vec_id", "embedding", qp,
      k = 5, nprobe = 1, rerank = 10).collect().toSet

  private def vecServeAt(path: String,
                         gen: Long): Set[org.apache.spark.sql.Row] =
    VectorIndex.topKAt(spark, path, gen, emb, "vec_id", "embedding",
      qp, k = 5, nprobe = 1, rerank = 10).collect().toSet

  private def hadoopFs(root: String) =
    new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def tmp(tag: String): java.io.File =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile

  private def buildVec(path: String): Unit = {
    VectorIndex.write(emb.filter(col("vec_id") < 200), "vec_id",
      "embedding", cents, cb, m, dim, path)
  }

  private def appendVec(path: String): String =
    VectorIndex.append(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 350),
      "vec_id", "embedding", path)

  test("vector index: the as-of-gen serve reproduces the pre-append " +
      "view bit-for-bit; the live-gen snapshot equals the live serve") {
    val dir = tmp("snap-vec")
    try {
      val path = dir.toString
      buildVec(path)
      val g0 = VectorIndex.currentGen(spark, path)
      // collected while g0 WAS the live view — the ground truth the
      // snapshot probe must later reproduce
      val before = vecServeLive(path)
      assert(before.nonEmpty)
      appendVec(path)
      val g1 = VectorIndex.currentGen(spark, path)
      assert(g1 > g0, "the append's swap must bump the gen fence")
      assert(vecServeAt(path, g0) == before,
        "the snapshot serve at the pre-append gen must be " +
          "bit-identical to the serve collected while that gen was " +
          "live")
      assert(vecServeAt(path, g1) == vecServeLive(path),
        "the snapshot serve at the CURRENT gen must equal the live " +
          "serve")
    } finally rmTree(dir)
  }

  test("vector index: compaction with a grace window keeps old " +
      "snapshots servable; reclaim expires them with the typed refusal") {
    val dir = tmp("snap-retain")
    try {
      val path = dir.toString
      buildVec(path)
      appendVec(path)
      val gPre = VectorIndex.currentGen(spark, path)
      val preCompact = vecServeLive(path)
      // retainMs > 0: superseded batch dirs stay on disk (invisible
      // to live probes) — the pre-compact snapshot stays answerable
      VectorIndex.compact(spark, path, retainMs = 3600L * 1000)
      assert(vecServeAt(path, gPre) == preCompact,
        "within the retain window the pre-compact gen must still " +
          "serve, bit-identical")
      // and the live serve is the compacted view, same rows
      assert(vecServeLive(path) == preCompact)
      // force-expire the retained dirs (what wall-clock would do):
      // re-mark with an already-passed deadline, then sweep on the
      // CURRENT committed list
      val fs = hadoopFs(path)
      val (committed, _) = IndexProtocol.listsFromMeta(fs, path)
      val retired = VectorIndex.readMeta(spark, path).retired
      retired.foreach { b =>
        IndexProtocol.clearPendingDelete(fs, path, b)
        IndexProtocol.markPendingDelete(fs, path, b, 0L, 0L)
      }
      IndexProtocol.sweepPendingDeletes(fs, path,
        System.currentTimeMillis(), committed)
      // the snapshot's batch dirs are physically gone → typed refusal
      val e = intercept[SnapshotUnavailable] { vecServeAt(path, gPre) }
      assert(e.getMessage.contains("physically reclaimed"))
      // the LIVE index is untouched by snapshot expiry
      assert(vecServeLive(path) == preCompact)
    } finally rmTree(dir)
  }

  test("vector index: a gen that never committed refuses typed; a " +
      "lost history record un-probes that gen but never un-commits it") {
    val dir = tmp("snap-crash")
    try {
      val path = dir.toString
      buildVec(path)
      val g0 = VectorIndex.currentGen(spark, path)
      val before = vecServeLive(path)
      appendVec(path)
      val g1 = VectorIndex.currentGen(spark, path)
      // never-committed gen → typed refusal naming the condition
      val eMissing = intercept[SnapshotUnavailable] {
        vecServeAt(path, g1 + 1000)
      }
      assert(eMissing.getMessage.contains("no snapshot record"))
      // simulate the crash between the append's meta swap and its
      // history record: the record for g1 is lost
      val fs = hadoopFs(path)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_meta_history/$g1"), false)
      // the LIVE index is fully intact — the history record never
      // participates in commit semantics (never un-commits)
      assert(VectorIndex.currentGen(spark, path) == g1)
      assert(vecServeLive(path).nonEmpty)
      // only the lost gen is unprobeable; earlier snapshots survive
      intercept[SnapshotUnavailable] { vecServeAt(path, g1) }
      assert(vecServeAt(path, g0) == before)
    } finally rmTree(dir)
  }

  test("bm25 index: the as-of-gen probe reproduces pre-append scores " +
      "from snapshot scalars; missing gens refuse typed") {
    import spark.implicits._
    val dir = tmp("snap-bm25")
    try {
      val path = dir.toString
      val docs = Seq((1L, "vector hash join fast pipeline"),
        (2L, "vector vector vector vector vector filler filler"),
        (3L, "hash join table scan"),
        (4L, "completely unrelated prose text"),
        (5L, "fast scan over the hash table"),
        (6L, "join join join vector table")).toDF("doc_id", "text")
      val query = "fast vector hash join"
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      Bm25.writeBm25Index(docs.filter(col("doc_id") <= 4), "doc_id",
        "text", path)
      val g0 = Bm25.currentGen(spark, path)
      val before = rows(Bm25.bm25TopKIndexed(spark, path, query, k = 10))
      // the append changes N, Σlen AND df — live scores move
      Bm25.appendBm25Index(docs.filter(col("doc_id") >= 5), "text", path)
      val g1 = Bm25.currentGen(spark, path)
      assert(g1 > g0)
      val live = rows(Bm25.bm25TopKIndexed(spark, path, query, k = 10))
      assert(live != before,
        "fixture must actually move the scores, or the snapshot " +
          "assertion below proves nothing")
      assert(rows(Bm25.bm25TopKIndexedAt(spark, path, g0, query,
        k = 10)) == before,
        "the snapshot probe must score with the SNAPSHOT's N/Σlen " +
          "and visibility — bit-identical to the pre-append probe")
      assert(rows(Bm25.bm25TopKIndexedAt(spark, path, g1, query,
        k = 10)) == live)
      val e = intercept[SnapshotUnavailable] {
        Bm25.bm25TopKIndexedAt(spark, path, g1 + 7, query, k = 10)
      }
      assert(e.getMessage.contains("no snapshot record"))
      // compaction with retainMs=0 reclaims superseded dirs outright:
      // pre-compact snapshots are past their (zero) retention → typed
      val gPre = Bm25.currentGen(spark, path)
      Bm25.compactBm25Index(spark, path)
      intercept[SnapshotUnavailable] {
        Bm25.bm25TopKIndexedAt(spark, path, gPre, query, k = 10)
      }
      // the compacted gen serves, identical rows
      assert(rows(Bm25.bm25TopKIndexedAt(spark, path,
        Bm25.currentGen(spark, path), query, k = 10)) == live)
    } finally rmTree(dir)
  }

  test("recordMetaHistory: the history log is bounded by the keep " +
      "cap — aged records drop, recent ones stay readable") {
    val dir = tmp("snap-cap")
    try {
      val root = dir.toString
      val fs = hadoopFs(root)
      (0L to 5L).foreach { g =>
        IndexProtocol.recordMetaHistory(fs, root, g,
          s"gen=$g".getBytes("UTF-8"), keep = 3)
      }
      // after recording gen 5 with keep=3, gens ≤ 2 are pruned
      (0L to 2L).foreach { g =>
        assert(IndexProtocol.readMetaHistory(fs, root, g).isEmpty,
          s"gen $g should have aged past the cap")
      }
      (3L to 5L).foreach { g =>
        val got = IndexProtocol.readMetaHistory(fs, root, g)
        assert(got.exists(b => new String(b, "UTF-8") == s"gen=$g"))
      }
    } finally rmTree(dir)
  }
}
