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
    * swap.
    */
  def swap(fs: FileSystem, marker: Path, bytes: Array[Byte]): Unit = {
    val next = nextOf(marker)
    val out = fs.create(next, true)
    try out.write(bytes) finally out.close()
    fs.delete(marker, false)
    require(fs.rename(next, marker), s"marker swap failed at $marker")
  }
}
