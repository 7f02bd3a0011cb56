package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T12 — distributed logistic-regression training for quality/source
  * classification (SURVEY.md §2.8): the learned-filter step of the
  * GPT-3/LLaMA data recipes — a cheap linear classifier over text
  * features, trained on a labeled slice (known-good vs known-bad
  * sources, or here: language membership), then run over the whole
  * corpus as a keep/drop scorer. Completes the trained-artifact
  * family beside `kmeansIterate` (A4b) and `BpeTrain` (T11).
  *
  * Distribution shape: batch gradient descent where each iteration is
  * ONE map-side-combinable aggregation — the gradient is a k-vector
  * of sums over rows, the all-reduce every distributed GD does — and
  * the only driver state is the k weights (bounded scalars, like the
  * k-means movement metric). The feature projection is computed once
  * and checkpointed; iterations never rescan the corpus' text.
  *
  * Reproducibility contract (how a GD loop becomes hash-gateable
  * cross-engine, the same discipline as A4b's raw-quotient means):
  *  - per-row gradient contributions `(σ(w·x) − y)·x_j` are rounded
  *    to 8 dp and summed in EXACT DECIMAL — partition-order
  *    independent, and a last-ulp `exp` difference between engines'
  *    libm almost never survives the rounding;
  *  - the gradient totals' unscaled values stay under 2^53, so even a
  *    naive decimal→double cast is exact in any engine;
  *  - weights are re-rounded to 9 dp after every update, so drift
  *    cannot compound across iterations.
  * The DuckDB gate unrolls every iteration and must land on the
  * identical weight trajectory.
  */
object Classifier {

  /** Round to `scale` dp, half away from zero — the driver-side twin
    * of Spark's and DuckDB's ROUND.
    */
  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train `iters` rounds of batch GD from zero weights. `feats` are
    * (name, expression) pairs — include an explicit ("bias", lit(1.0))
    * if a bias is wanted; `labelCol` must evaluate to 0/1. Returns the
    * weight trajectory (round, feature, weight), round 1-based;
    * the last round's weights ARE the classifier.
    */
  def trainLogistic(df: DataFrame, labelCol: Column,
                    feats: Seq[(String, Column)], iters: Int = 4,
                    lr: Double = 1.0): DataFrame = {
    require(feats.nonEmpty, "need at least one feature")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val names = feats.map(_._1)
    val base = graft.Checkpoints.truncate(
      graft.sources.Tables.fanOut(df.select(
        labelCol.cast("double").as("__y") +:
          feats.map { case (n, c) => c.cast("double").as(s"__f_$n") }: _*)))
    val nD = base.count().toDouble
    val w = Array.fill(feats.size)(0.0)
    val out = Seq.newBuilder[(Int, String, Double)]
    for (it <- 1 to iters) {
      val margin = names.zipWithIndex
        .map { case (n, j) => lit(w(j)) * col(s"__f_$n") }
        .reduce(_ + _)
      val sig = lit(1.0) / (lit(1.0) + exp(negate(margin)))
      val gradAggs = names.map { n =>
        sum(round((sig - col("__y")) * col(s"__f_$n"), 8)
          .cast("decimal(28,8)")).as(s"__g_$n")
      }
      // one row of k exact-decimal gradient sums — a bounded driver
      // scalar pull, never data
      val g = base.agg(gradAggs.head, gradAggs.tail: _*).head()
      names.indices.foreach { j =>
        w(j) = rnd(w(j) - lr * g.getDecimal(j).doubleValue() / nD, 9)
      }
      names.indices.foreach(j => out += ((it, names(j), w(j))))
    }
    out.result().toDF("round", "feature", "weight")
  }

  /** Score rows with a trained weight vector: the corpus-wide
    * keep/drop pass (one projection, no shuffle). Returns the input
    * plus `score` (σ(w·x)) and `keep` (score ≥ threshold).
    */
  def scoreLogistic(df: DataFrame, feats: Seq[(String, Column)],
                    weights: Map[String, Double],
                    threshold: Double = 0.5): DataFrame = {
    val margin = feats
      .map { case (n, c) => lit(weights(n)) * c.cast("double") }
      .reduce(_ + _)
    df.withColumn("score", lit(1.0) / (lit(1.0) + exp(negate(margin))))
      .withColumn("keep", col("score") >= threshold)
  }

  /** The gate's feature set: bias + the quality-report ratios — each
    * individually proven bit-identical cross-engine by the
    * q_text_quality hash gate, which is what makes the GD trajectory
    * mirrorable at all.
    */
  def qualityFeatures(textCol: Column): Seq[(String, Column)] = {
    val T = graft.functions.TextFunctions
    Seq(
      "bias" -> lit(1.0),
      "alpha" -> T.alphaRatio(textCol),
      "punct" -> T.punctRatio(textCol),
      "stop" -> T.stopwordRatio(textCol),
      "mtl" -> least(T.meanTokenLen(textCol) / 10.0, lit(1.0)))
  }
}
