package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.{CountInSet, FreqSketchAgg, FreqSketchMergeAgg, MinRollingHash, SumStringLengths, TopKByAgg, VectorDot}

/** Spark extension entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT min_rolling_hash(text, 16)
  * ...")` works next to the Column API — and injects the DML parser
  * ([[graft.sources.GraftSqlParser]]) that routes `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` on `graft-snapshot` views to the pointer
  * tables' Scala DML ops.
  *
  * Two registration paths:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (constructor injection, works for every session of the app);
  *  - per-session: `GraftExtensions.register(spark)` on an existing
  *    session (temp-function registry — functions only; the parser
  *    can only be injected at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))
    // catalog reads (graft.ns.table, VERSION/TIMESTAMP AS OF) resolve
    // to the DSv1 stats-pruned relation — see GraftCatalogRule
    e.injectResolutionRule(session =>
      new graft.sources.GraftCatalogRule(session))
  }
}

object GraftExtensions {
  private def intArg(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case _                  => default
  }

  private[graft] val builders: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("min_rolling_hash",
      new ExpressionInfo(classOf[MinRollingHash].getName, "min_rolling_hash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c)    => MinRollingHash(c, 16)
        case Seq(c, k) => MinRollingHash(c, intArg(k, 16))
        case _ => throw new IllegalArgumentException(
          "min_rolling_hash(text[, k])")
      }),
    ("vector_dot",
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VectorDot(a, b)
        case _ => throw new IllegalArgumentException("vector_dot(a, b)")
      }),
    // the word set must be a LITERAL array — it becomes the
    // expression's compile-time hash set (that's what makes the
    // per-token probe O(1)); a non-literal second argument is a
    // usage error, reported as such
    ("count_in_set",
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, words) => CountInSet(c, literalStrings(words))
        case _ => throw new IllegalArgumentException(
          "count_in_set(tokens, array('w1', 'w2', ...))")
      }),
    ("sum_string_lengths",
      new ExpressionInfo(classOf[SumStringLengths].getName,
        "sum_string_lengths"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => SumStringLengths(c)
        case _ => throw new IllegalArgumentException(
          "sum_string_lengths(tokens)")
      }),
    // aggregates: the analyzer wraps a returned AggregateFunction in
    // its AggregateExpression, so these work directly in SQL GROUP BYs
    ("freq_sketch",
      new ExpressionInfo(classOf[FreqSketchAgg].getName, "freq_sketch"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => FreqSketchAgg(c, intArg(k, 128))
        case _ => throw new IllegalArgumentException(
          "freq_sketch(value, k)")
      }),
    ("freq_sketch_merge",
      new ExpressionInfo(classOf[FreqSketchMergeAgg].getName,
        "freq_sketch_merge"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => FreqSketchMergeAgg(c, intArg(k, 128))
        case _ => throw new IllegalArgumentException(
          "freq_sketch_merge(sketch, k)")
      }),
    ("topk_by",
      new ExpressionInfo(classOf[TopKByAgg].getName, "topk_by"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s, i, k) => TopKByAgg(s, i, intArg(k, 10))
        case _ => throw new IllegalArgumentException(
          "topk_by(score, id, k)")
      }))

  private def literalStrings(e: Expression): Seq[String] = e match {
    case CreateArray(items, _) => items.map {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"count_in_set needs string literals in its word array, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"count_in_set needs a literal array('w1', ...) word set, got $other")
  }

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
