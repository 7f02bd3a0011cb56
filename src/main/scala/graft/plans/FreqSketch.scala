package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Misra–Gries kernel: a bounded set of `(item → counter)`
  * pairs with AT MOST `k` counters alive, the classic deterministic
  * heavy-hitter summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Contract (the reason this is safe to build pipelines on):
  * after summarizing any stream of `n` items,
  *   `true_count − n/(k+1)  ≤  counter  ≤  true_count`
  * for every item (counter 0 if absent) — so EVERY item with true
  * count strictly greater than `n/(k+1)` is still present in the
  * sketch. Merging two sketches adds their error budgets, keeping the
  * same bound for the combined `n`. Memory is O(k) regardless of
  * stream length or distinct-item count — the property that lets one
  * executor thread summarize an arbitrarily large partition without
  * a per-distinct-key hash map (the failure mode of a plain groupBy
  * on a 100 TB token stream whose distinct count is itself huge).
  *
  * Counter maintenance:
  *  - hit → increment;
  *  - miss with a free slot → insert at 1;
  *  - miss with k counters alive → decrement ALL by 1, dropping
  *    zeros (the arriving item is consumed by the decrement round).
  *    Each such round retires k+1 observations, so rounds ≤ n/(k+1)
  *    and total update work is O(n) amortized.
  *  - merge → add counters pairwise; if more than `k` survive,
  *    subtract the (k+1)-th largest counter value from all and drop
  *    the non-positives (a sort over ≤ 2k counters — sketch-sized).
  */
object MisraGriesKernel {
  type Buf = java.util.HashMap[UTF8String, Long]

  def newBuf(): Buf = new java.util.HashMap[UTF8String, Long]()

  /** One observation. `item` must already be storage-owned (cloned
    * out of any reused scan buffer) when it can end up retained.
    */
  def observe(buf: Buf, item: UTF8String, k: Int): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
    else if (buf.size < k) buf.put(item.clone(), 1L)
    else decrementAll(buf, 1L)
  }

  /** Fold `other` into `buf` (both ≤ k counters; result ≤ k). */
  def mergeInto(buf: Buf, other: Buf, k: Int): Unit = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != 0L || buf.containsKey(e.getKey))
        buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey.clone(), e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everything: the
      // smallest offset that leaves ≤ k strictly-positive counters
      val vals = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      decrementAll(buf, vals(buf.size - k - 1))
    }
  }

  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newBuf()
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  def toMapData(buf: Buf): MapData = {
    val ks = new Array[Any](buf.size)
    val vs = new Array[Any](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); ks(i) = e.getKey; vs(i) = e.getValue; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  val outType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
}

/** Aggregate: Misra–Gries sketch of a STRING column → one
  * `map<string,bigint>` of ≤ `k` surviving counters (lower-bound
  * counts). Null inputs are skipped, like every Spark aggregate.
  */
case class FreqSketchAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesKernel.Buf] {
  require(k > 0, s"freq sketch capacity must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesKernel.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch needs a string child, got $other")
  }

  override def createAggregationBuffer(): MisraGriesKernel.Buf =
    MisraGriesKernel.newBuf()

  override def update(buf: MisraGriesKernel.Buf,
                      input: InternalRow): MisraGriesKernel.Buf = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesKernel.observe(buf, v.asInstanceOf[UTF8String], k)
    buf
  }

  override def merge(buf: MisraGriesKernel.Buf,
                     other: MisraGriesKernel.Buf): MisraGriesKernel.Buf = {
    MisraGriesKernel.mergeInto(buf, other, k); buf
  }

  override def eval(buf: MisraGriesKernel.Buf): Any =
    MisraGriesKernel.toMapData(buf)

  override def serialize(buf: MisraGriesKernel.Buf): Array[Byte] =
    MisraGriesKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MisraGriesKernel.Buf =
    MisraGriesKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_sketch"
}

/** Aggregate: union of STORED sketches — input `map<string,bigint>`
  * rows (as produced by [[FreqSketchAgg]], e.g. one per daily shard),
  * Misra–Gries-merged into one sketch of ≤ `k` counters. Lossy like
  * the per-row sketch, same additive error bound; lets incremental
  * profiling keep one tiny row per batch and answer corpus-wide
  * heavy-hitter questions without re-scanning history (the frequency
  * analog of the HLL-union and histogram-sum patterns).
  */
case class FreqSketchMergeAgg(child: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesKernel.Buf] {
  require(k > 0, s"freq sketch capacity must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesKernel.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(_: StringType, LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_merge needs a map<string,bigint> child, got $other")
  }

  override def createAggregationBuffer(): MisraGriesKernel.Buf =
    MisraGriesKernel.newBuf()

  override def update(buf: MisraGriesKernel.Buf,
                      input: InternalRow): MisraGriesKernel.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val other = MisraGriesKernel.newBuf()
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        other.put(ks.getUTF8String(i).clone(), vs.getLong(i))
        i += 1
      }
      MisraGriesKernel.mergeInto(buf, other, k)
    }
    buf
  }

  override def merge(buf: MisraGriesKernel.Buf,
                     other: MisraGriesKernel.Buf): MisraGriesKernel.Buf = {
    MisraGriesKernel.mergeInto(buf, other, k); buf
  }

  override def eval(buf: MisraGriesKernel.Buf): Any =
    MisraGriesKernel.toMapData(buf)

  override def serialize(buf: MisraGriesKernel.Buf): Array[Byte] =
    MisraGriesKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MisraGriesKernel.Buf =
    MisraGriesKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_sketch_merge"
}
