package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared commit-marker swap protocol of the persisted indexes —
  * BM25 `_meta`, vector-index `_meta`, and the serving pointer all
  * commit small marker files the same way: stage `<marker>.next`,
  * delete the committed marker, rename the stage in. A crash between
  * the delete and the rename leaves only `.next`; [[heal]] lets the
  * next reader complete the rename, making the swap effectively
  * atomic for every reader that comes after the crash.
  *
  * One implementation instead of three copies, so a protocol change
  * (e.g. a future check-and-set for multi-writer deployments) cannot
  * silently diverge between the indexes. The protocol is
  * LAST-WRITER-WINS by construction — the single-maintainer contract
  * documented at every compact/drop call site exists because of this.
  */
private[graft] object MetaSwap {

  private def nextOf(marker: Path): Path =
    new Path(marker.getParent, marker.getName + ".next")

  /** Complete a crashed swap: `.next` present without the committed
    * marker renames in. No-op otherwise.
    */
  def heal(fs: FileSystem, marker: Path): Unit = {
    val next = nextOf(marker)
    if (!fs.exists(marker) && fs.exists(next)) {
      fs.rename(next, marker); ()
    }
  }

  /** Commit `bytes` as the marker's new content via the self-healing
    * swap. Tolerates the one benign race the protocol itself creates:
    * between this writer's delete and rename, a concurrent READER's
    * [[heal]] may complete the commit first — the writer's rename
    * then fails, but the marker already holds exactly these bytes, so
    * the commit succeeded. Only a rename failure with the marker
    * absent or holding OTHER content is a real error.
    */
  def swap(fs: FileSystem, marker: Path, bytes: Array[Byte]): Unit = {
    val next = nextOf(marker)
    val out = fs.create(next, true)
    try out.write(bytes) finally out.close()
    fs.delete(marker, false)
    if (!fs.rename(next, marker)) {
      val committed =
        if (!fs.exists(marker)) null
        else {
          val in = fs.open(marker)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            var n = in.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            buf.toByteArray
          } finally in.close()
        }
      require(committed != null &&
        java.util.Arrays.equals(committed, bytes),
        s"marker swap failed at $marker")
    }
  }
}
