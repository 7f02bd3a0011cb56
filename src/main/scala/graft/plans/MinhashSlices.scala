package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash window extraction (r19).
  *
  * [[graft.operators.Dedup.signatureFromIndex]]'s declared signature
  * scheme is: digest = lowercase hex of sha256(shingle); "hash
  * function" i = the 8-hex-char window starting at 1-based offset
  * 1 + 3i, i.e. `substring(sha2(sh, 256), 1 + 3i, 8)`; signature =
  * per-document MIN of each window. Aggregating those windows as
  * STRINGS makes the aggregation buffer variable-width, which forces
  * Spark's SortAggregate — a full sort of the shingle index on BOTH
  * sides of the partial/final split, per signature build — and costs
  * 16 `UTF8String.substring` allocations per row on top of the hex
  * rendering of the digest.
  *
  * [[MinhashLongs]] computes the same windows as LONGS straight off
  * the 32 digest bytes (hex char j of the rendering is nibble j of
  * the digest, so window i is nibbles [3i, 3i+8) composed big-endian
  * — no hex string ever materializes). VALUE PARITY: the windows are
  * fixed-width lowercase-hex renderings of 32-bit values, and
  * fixed-width base-16 strings over a single case order lexicographic-
  * compare exactly as their numeric values — `'0' < … < '9' < 'a' <
  * … < 'f'` is monotone in the digit value — so `min(long window)`
  * picks the same element as `min(string window)`, and
  * `format_string("%08x", v)` re-renders the chosen value to the
  * identical 8-char string. The long buffer is fixed-width, so the
  * signature becomes a plain HashAggregate (no sort), pinned
  * differentially by MinhashParitySpec.
  */
object MinhashSlices {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** sha256(s)'s hex windows [3i, 3i+8) for i in [0, k) as longs. */
  def minhashLongs(s: UTF8String, k: Int): ArrayData = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var v = 0L
      var j = 3 * i
      val end = j + 8
      while (j < end) {
        val b = dig(j >> 1) & 0xFF
        v = (v << 4) | (if ((j & 1) == 0) b >>> 4 else b & 0xF)
        j += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` of the k MinHash windows of sha256(child) — see
  * [[MinhashSlices]] for the value-parity contract with
  * `substring(sha2(child, 256), 1 + 3i, 8)`.
  */
case class MinhashLongs(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 19, s"k must be in [1,19], got $k")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MinhashLongs needs a string child, got $other")
    }
  override def nullSafeEval(input: Any): Any =
    MinhashSlices.minhashLongs(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.MinhashSlices.minhashLongs($s, $k)")
  override protected def withNewChildInternal(newChild: Expression)
      : MinhashLongs = copy(child = newChild)
}

object MinhashSlicesApi {
  def minhash_longs(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(MinhashLongs(GraftSqlBridge.toExpression(c), k))
}
