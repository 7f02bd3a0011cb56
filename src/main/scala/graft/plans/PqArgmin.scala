package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Per-row PQ code argmin (r19).
  *
  * The PQ encode/train assign step was phrased as a broadcast join of
  * the sliced corpus against the codebook (n·M·K joined rows, each
  * assembling a (subvec, centv) pair row) reduced back to n·M by a
  * `min(struct(l2key, code))` aggregate — but `sliced` emits exactly
  * ONE row per (id, subspace), so the groupBy groups are singletons
  * and the whole join+aggregate is a per-row argmin. [[NearestCode]]
  * computes that argmin directly: one expression call per (id,
  * subspace) row looping the collected codebook — no join row
  * assembly, no aggregation hash table, no exchange (the encode
  * becomes a pure map over the scan).
  *
  * VALUE PARITY with `min(struct(cc - 2.0*dot(subvec, centv), code))`:
  * - the dot is the same index-ordered left fold as
  *   [[graft.plans.VectorDot]] (float elements widened per element);
  * - cc (‖centv‖², precomputed on the broadcast side before) is
  *   computed once per code at book build with the same fold;
  * - the comparison replicates Spark's SQL double ordering
  *   (SQLOrderingUtil.compareDoubles: ==/</> first, NaN largest,
  *   -0.0 == 0.0), iterating codes in ascending order with
  *   strictly-smaller replacement — exactly the struct-min's
  *   (cdist, code) lexicographic minimum, ties to the smallest code.
  * Pinned differentially by PqArgminParitySpec and the ANN oracle
  * gates.
  */
final class PqBook(val codes: Array[Array[Long]],
                   val cents: Array[Array[Array[Double]]],
                   val ccs: Array[Array[Double]]) extends Serializable {

  def nearest(s: Int, v: ArrayData, isFloat: Boolean): Long = {
    val ids = codes(s)
    val cs = cents(s)
    val cc = ccs(s)
    var best = 0L
    var bestD = 0.0
    var first = true
    var k = 0
    while (k < ids.length) {
      val cv = cs(k)
      val n = math.min(v.numElements(), cv.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        val xv = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        d += xv * cv(j)
        j += 1
      }
      val cd = cc(k) - 2.0 * d
      // Spark SQL double ordering: == / < / > decide first (-0.0 ==
      // 0.0), the NaN cases fall through to Double.compare (NaN
      // largest); ties keep the earlier (smaller) code
      val replace = first ||
        (if (cd == bestD) false
         else if (cd < bestD) true
         else if (cd > bestD) false
         else java.lang.Double.compare(cd, bestD) < 0)
      if (replace) { bestD = cd; best = ids(k); first = false }
      k += 1
    }
    best
  }
}

object PqBook {
  /** Collect a codebook table into a [[PqBook]]: per subspace the
    * codes sorted ascending, their centroids (float elements widened
    * exactly), and ‖centv‖² by the [[graft.plans.VectorDot]] fold.
    */
  def fromCodebook(df: DataFrame, m: Int, sCol: String, cCol: String,
                   vCol: String): PqBook = {
    val rows = df.select(col(sCol).cast("int"), col(cCol).cast("long"),
      col(vCol)).collect()
    require(rows.nonEmpty, "cannot build a PqBook from an empty codebook")
    val bySub = Array.fill(m)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])])
    rows.foreach { r =>
      val s = r.getInt(0)
      require(s >= 0 && s < m, s"subspace $s out of range [0,$m)")
      val v = r.getSeq[Any](2).map {
        case f: java.lang.Float  => f.toDouble
        case d: java.lang.Double => d.doubleValue()
      }.toArray
      bySub(s) += ((r.getLong(1), v))
    }
    val codes = Array.ofDim[Array[Long]](m)
    val cents = Array.ofDim[Array[Array[Double]]](m)
    val ccs = Array.ofDim[Array[Double]](m)
    var s = 0
    while (s < m) {
      val sorted = bySub(s).sortBy(_._1).toArray
      require(sorted.nonEmpty, s"codebook has no codes for subspace $s")
      codes(s) = sorted.map(_._1)
      cents(s) = sorted.map(_._2)
      ccs(s) = sorted.map { case (_, cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
        acc
      }
      s += 1
    }
    new PqBook(codes, cents, ccs)
  }
}

/** `bigint` nearest code of `subvec` within its `subspace` — see
  * [[PqBook]] for the parity contract with the join+struct-min form.
  */
case class NearestCode(subspace: Expression, subvec: Expression,
                       book: PqBook) extends BinaryExpression {
  override def left: Expression = subspace
  override def right: Expression = subvec
  override def dataType: DataType = LongType
  private def isFloat: Boolean = subvec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (subspace.dataType, subvec.dataType) match {
      case (IntegerType, ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, v) => TypeCheckResult.TypeCheckFailure(
        s"NearestCode needs (int, array<float|double>), got ($s, $v)")
    }
  override def nullSafeEval(s: Any, v: Any): Any =
    book.nearest(s.asInstanceOf[Int], v.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book,
      classOf[PqBook].getName)
    nullSafeCodeGen(ctx, ev,
      (s, v) => s"${ev.value} = $bookRef.nearest($s, $v, $isFloat);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCode =
    copy(subspace = newLeft, subvec = newRight)
}

object PqArgminApi {
  def nearest_code(subspace: Column, subvec: Column,
                   book: PqBook): Column =
    GraftSqlBridge.toColumn(NearestCode(
      GraftSqlBridge.toExpression(subspace),
      GraftSqlBridge.toExpression(subvec), book))
}
