package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum of all `k`-byte
  * window polynomial hashes over the UTF-8 bytes of the input
  * (Rabin–Karp rolling hash, base 257, 64-bit wraparound).
  *
  * Two documents sharing any k-byte run share window hashes, so equal
  * fingerprints are strong near-duplicate evidence — the classic
  * winnowing/fingerprinting primitive (Schleimer et al., SIGMOD 2003)
  * for 100 TB corpus dedup where full pairwise comparison is
  * impossible.
  *
  * Implemented as a native Catalyst expression WITH `doGenCode` (not a
  * UDF, not CodegenFallback): the O(n) rolling loop runs inside
  * WholeStageCodegen, no boxing, no serialization — this is the
  * preferred extension point when built-in functions can't express an
  * operation (SURVEY.md §4).
  *
  * Null in → null out. Strings shorter than `k` bytes hash their whole
  * byte array once.
  */
case class MinRollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"MinRollingHash needs a string child, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    MinRollingHash.minHash(bytes, k)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinRollingHash.minHash($c.getBytes(), $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinRollingHash = copy(child = newChild)
}

object MinRollingHash {
  final val Base = 257L

  /** Min of all k-window rolling hashes; whole-array hash if shorter.
    * Shared by interpreted eval and generated code.
    */
  def minHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = if (n < k) n else k
    // base^(w-1) for the roll-out term
    var pow = 1L
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API: `min_rolling_hash($"text", 16)`. */
  def min_rolling_hash(c: Column, k: Int = 16): Column =
    GraftSqlBridge.toColumn(
      MinRollingHash(GraftSqlBridge.toExpression(c), k))
}
