package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential parity for the r19 PQ argmin kernel
  * (graft.plans.PqBook / NearestCode): the collected-codebook per-row
  * argmin must reproduce the broadcast-join + min(struct(l2key, code))
  * form code-for-code on the real embeddings — including through a
  * full multi-round training loop (round 0 assigns against FLOAT
  * seed centroids, later rounds against DOUBLE means, exercising both
  * element widths). The ANN oracle gates re-prove the end-to-end
  * recall/hash contracts; this pins the kernel itself.
  */
class PqArgminParitySpec extends AnyFunSuite {
  import SparkTestSession._

  private val (m, dim) = (8, 64)

  private def emb = sources.Tables
    .table(spark, "/root/testdata/sf0.01", "embeddings")

  /** The pre-r19 join+struct-min encode, kept verbatim as the
    * differential reference.
    */
  private def legacyEncode(e: org.apache.spark.sql.DataFrame,
                           cb: org.apache.spark.sql.DataFrame) = {
    val sd = dim / m
    val slices = array((0 until m).map(j =>
      slice(col("embedding"), j * sd + 1, sd)): _*)
    val sliced = e.select(col("vec_id").as("cand_id"),
      posexplode(slices).as(Seq("subspace", "subvec")))
    sliced
      .join(broadcast(cb.withColumn("cc",
        operators.Similarity.dot(col("centv"), col("centv")))),
        Seq("subspace"))
      .groupBy(col("cand_id"), col("subspace"))
      .agg(min(struct(
        (col("cc") - lit(2.0) *
          operators.Similarity.dot(col("subvec"), col("centv")))
          .as("cdist"),
        col("code"))).as("__w"))
      .select(col("cand_id").as("id"), col("subspace"),
        col("__w.code").as("code"))
  }

  test("kernel encode == join+struct-min encode, float seed codebook") {
    // an UNTRAINED codebook built straight from emb rows keeps the
    // centroids float — the round-0 element-width case
    val sd = dim / m
    val slices = array((0 until m).map(j =>
      slice(col("embedding"), j * sd + 1, sd)): _*)
    val cb = emb.filter(col("vec_id") % 17 === 5)
      .select(col("vec_id").as("code"),
        posexplode(slices).as(Seq("subspace", "centv")))
      .select(col("subspace"), col("code"), col("centv"))
    val kernel = operators.Similarity.pqEncode(emb, "vec_id",
      "embedding", cb, m, dim)
    val legacy = legacyEncode(emb, cb)
    assert(kernel.exceptAll(legacy).isEmpty &&
      legacy.exceptAll(kernel).isEmpty,
      "kernel encode differs from the join+struct-min encode " +
        "(float codebook)")
  }

  test("kernel-assigned training == join+struct-min training") {
    // the full 3-round loop must produce the bit-identical codebook:
    // same assignments per round (argmin parity) feeding the same
    // decimal-grid stats pipeline
    val sd = dim / m
    val slices = array((0 until m).map(j =>
      slice(col("embedding"), j * sd + 1, sd)): _*)
    def slicedOf(e: org.apache.spark.sql.DataFrame) =
      e.select(col("vec_id").as("cand_id"),
        posexplode(slices).as(Seq("subspace", "subvec")))
    val long = sources.Tables.fanOut(slicedOf(emb)).persist()
    try {
      var cent = slicedOf(emb.filter(col("vec_id") % 17 === 5))
        .select(col("subspace"), col("cand_id").as("cell"),
          col("subvec").as("centv"))
      (0 until 3).foreach { _ =>
        val stats = long
          .join(broadcast(cent.withColumn("cc",
            operators.Similarity.dot(col("centv"), col("centv")))),
            Seq("subspace"))
          .groupBy(col("cand_id"), col("subspace"))
          .agg(min(struct(
            (col("cc") - lit(2.0) *
              operators.Similarity.dot(col("subvec"), col("centv")))
              .as("cdist"),
            col("cell"), col("subvec"))).as("__w"))
          .select(col("subspace"), col("__w.cell").as("cell"),
            posexplode(col("__w.subvec")).as(Seq("pos", "v")))
          .select(col("subspace"), col("cell"),
            (col("pos") + 1).cast("bigint").as("pos"),
            round(col("v").cast("double"), 6).cast("decimal(18,6)")
              .as("el"))
          .groupBy(col("subspace"), col("cell"), col("pos"))
          .agg(sum(col("el")).cast("double").as("sum_val"),
            count(lit(1)).as("n_vec"))
        cent = stats
          .select(col("subspace"), col("cell"), col("pos"),
            (col("sum_val") / col("n_vec")).as("mean_val"))
          .groupBy(col("subspace"), col("cell"))
          .agg(array_sort(
              collect_list(struct(col("pos"), col("mean_val").as("mv"))))
            .as("__pm"))
          .select(col("subspace"), col("cell"),
            transform(col("__pm"), p => p.getField("mv")).as("centv"))
          .localCheckpoint()
      }
      val legacyCb = cent.select(col("subspace"),
        col("cell").as("code"), col("centv"))
      val kernelCb = operators.Similarity.pqTrain(emb, "vec_id",
        "embedding", m, dim, initPred = col("vec_id") % 17 === 5,
        rounds = 3)
      assert(kernelCb.exceptAll(legacyCb).isEmpty &&
        legacyCb.exceptAll(kernelCb).isEmpty,
        "kernel-assigned training drifted from the join+struct-min " +
          "training")
    } finally { long.unpersist(); () }
  }

  test("kernel encode == join+struct-min encode, trained codebook") {
    val cb = operators.Similarity.pqTrain(emb, "vec_id", "embedding",
      m, dim, initPred = col("vec_id") % 17 === 5, rounds = 3)
      .localCheckpoint()
    val kernel = operators.Similarity.pqEncode(emb, "vec_id",
      "embedding", cb, m, dim)
    val legacy = legacyEncode(emb, cb)
    assert(kernel.exceptAll(legacy).isEmpty &&
      legacy.exceptAll(kernel).isEmpty,
      "kernel encode differs from the join+struct-min encode " +
        "(trained double codebook)")
  }
}
