package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of `array<string>` elements present in a fixed word set.
  *
  * Replaces the `size(filter(arr, t => array_contains(lit_array, t)))`
  * higher-order-function form: Spark executes HOF lambdas on the
  * INTERPRETED path (per-element NamedLambdaVariable dispatch and a
  * linear scan of the literal array per token), which made this the
  * engine's last interpreted hot loop — it sits under the language-ID
  * and quality-score metrics feeding four driver gates. This expression
  * generates a tight loop over the array with an O(1) hash-set probe
  * per element, fused into WholeStageCodegen.
  *
  * Value parity with the HOF form (same int count): membership is
  * UTF8String binary equality exactly like `array_contains`, and null
  * elements are skipped exactly like a null lambda predicate result.
  * Null array in → null out.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CountInSet needs an array<string> child, got $other")
  }

  // Rebuilt per (de)serialized instance; tiny (stopword tables).
  @transient private lazy val set: java.util.HashSet[UTF8String] =
    CountInSet.buildSet(words)

  override def nullSafeEval(input: Any): Any =
    CountInSet.countIn(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.CountInSet.countIn($a, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CountInSet = copy(child = newChild)
}

object CountInSet {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Shared by interpreted eval and generated code. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column API: `count_in_set($"tokens", stopwords)`. */
  def count_in_set(c: Column, words: Seq[String]): Column =
    GraftSqlBridge.toColumn(
      CountInSet(GraftSqlBridge.toExpression(c), words))
}

/** Sum of character lengths (`length` semantics: code-point-aware
  * numChars) over an `array<string>` column.
  *
  * Replaces `aggregate(transform(arr, t => length(t)), 0, _ + _)` —
  * two chained interpreted-lambda passes plus an intermediate int
  * array — with one codegen'd loop. Feeds the mean-token-length
  * quality metric.
  *
  * Value parity: integer accumulation like the `lit(0)` seed. Null
  * elements are skipped (the HOF form nulls the whole sum on a null
  * element, but the only producer here is `split`, which never yields
  * null elements). Null array in → null out.
  */
case class SumStringLengths(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SumStringLengths needs an array<string> child, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SumStringLengths.sumLengths(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.SumStringLengths.sumLengths($a)")

  override protected def withNewChildInternal(newChild: Expression)
      : SumStringLengths = copy(child = newChild)
}

object SumStringLengths {
  /** Shared by interpreted eval and generated code. */
  def sumLengths(arr: ArrayData): Int = {
    val n = arr.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) s += arr.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Column API: `sum_string_lengths($"tokens")`.
    *
    * Null contract: null ELEMENTS are skipped (contribute 0), unlike
    * the `aggregate(transform(...))` HOF form this replaces, which
    * nulls the whole sum on any null element. The engine's only
    * producer (`split`) never yields null elements, so the two agree
    * there — but callers passing arbitrary `array<string>` with null
    * elements get the skip-nulls behavior. Null ARRAY in → null out.
    */
  def sum_string_lengths(c: Column): Column =
    GraftSqlBridge.toColumn(
      SumStringLengths(GraftSqlBridge.toExpression(c)))
}
