package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded exact top-k buffer over `(score, id)` pairs, ordered score
  * desc / id asc (doubles compare like Spark's sort order:
  * `java.lang.Double.compare` — NaN largest, -0.0 < 0.0 — so a
  * windowed `ORDER BY score DESC, id` over the same rows selects the
  * same k pairs). Memory is O(k) per buffer: inserts append and the
  * buffer compacts to the best k whenever it reaches 2k, so update
  * cost is O(log k) amortized per element.
  *
  * EXACT, not a sketch: the top-k of a union is the top-k of the
  * per-part top-k's (any dropped pair is beaten by k survivors in
  * its own part, hence by k pairs in the union), so map-side partial
  * buffers lose nothing. This is what makes per-group top-k safe to
  * run as an AGGREGATE — a per-partition combiner ships k pairs per
  * group instead of shuffle-sorting every scored row under a window.
  */
object TopKKernel {
  /** (score, id); ranks before ⇔ compares smaller. */
  val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  final class Buf(val k: Int) {
    val items: ArrayBuffer[(Double, Long)] = new ArrayBuffer(2 * k)
    def add(score: Double, id: Long): Unit = {
      items += ((score, id))
      if (items.length >= 2 * k) compact()
    }
    def compact(): Unit = {
      val kept = items.sorted(ord).take(k)
      items.clear(); items ++= kept
    }
  }

  def mergeInto(buf: Buf, other: Buf): Buf = {
    other.items.foreach(p => buf.add(p._1, p._2)); buf
  }

  /** Final ranking: array<struct<id, score>> sorted best-first. */
  def toArrayData(buf: Buf): GenericArrayData = {
    val kept = buf.items.sorted(ord).take(buf.k)
    new GenericArrayData(kept.map(p => InternalRow(p._2, p._1)).toArray[Any])
  }

  def serialize(buf: Buf): Array[Byte] = {
    buf.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.items.length)
    buf.items.foreach { p => out.writeDouble(p._1); out.writeLong(p._2) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte], k: Int): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(k)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
}

/** Aggregate: exact top-`k` `(id, score)` pairs per group by score
  * desc / id asc — the combinable form of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id) <= k`.
  * Rows with a null score or id are skipped, like every Spark
  * aggregate.
  */
case class TopKByAgg(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKKernel.Buf] {
  require(k > 0, s"topk_by needs a positive k, got $k")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = TopKKernel.outType

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by needs (double score, bigint id) children, got $other")
    }

  override def createAggregationBuffer(): TopKKernel.Buf =
    new TopKKernel.Buf(k)

  override def update(buf: TopKKernel.Buf,
                      input: InternalRow): TopKKernel.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKKernel.Buf,
                     other: TopKKernel.Buf): TopKKernel.Buf =
    TopKKernel.mergeInto(buf, other)

  override def eval(buf: TopKKernel.Buf): Any =
    TopKKernel.toArrayData(buf)

  override def serialize(buf: TopKKernel.Buf): Array[Byte] =
    TopKKernel.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TopKKernel.Buf =
    TopKKernel.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by"
}
