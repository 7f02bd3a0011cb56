package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{MinRollingHash, VectorDot}

/** Spark extension entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT min_rolling_hash(text, 16)
  * ...")` works next to the Column API.
  *
  * Two registration paths:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (constructor injection, works for every session of the app);
  *  - per-session: `GraftExtensions.register(spark)` on an existing
  *    session (temp-function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
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
      }))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
