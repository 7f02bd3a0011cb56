package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Dev tool: per-stage wall times of the q_llm_pipeline composition. */
object LlmStageProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val tf = graft.functions.TextFunctions
    val normed = Tables.table(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        tf.stripMarkup(
          concat(lit("<div class=\"doc\"><p>"), col("text"),
            lit("</p></div> source: https://example.com/doc?id="),
            col("doc_id"),
            lit(" &amp; more&nbsp;it&#39;s &#x2019;quoted&#x2019;")))
          .as("clean_text"))
      .withColumn("norm_text", tf.normalizeText(col("clean_text")))
      .persist()
    t("materialize normed")(normed.count())
    val mhPairs = Dedup.minhashDedup(normed, "doc_id", "norm_text")
      .select(col("id_a"), col("id_b"))
    t("minhash pairs")(mhPairs.count())
    val hashed = normed.select(col("doc_id"), sha2(col("norm_text"), 256).as("h"))
    val exactPairs = hashed.join(
        hashed.groupBy(col("h")).agg(min(col("doc_id")).as("keep")), Seq("h"))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("keep").as("id_a"), col("doc_id").as("id_b"))
    t("exact pairs")(exactPairs.count())
    val groups = t("resolveGroups")(Dedup.resolveGroups(
        normed.select(col("doc_id").as("id")),
        mhPairs.unionByName(exactPairs))
      .withColumnRenamed("id", "doc_id"))
    val canon = t("canonical")(Dedup.keepCanonical(
      normed.join(groups, Seq("doc_id"))
        .withColumn("q", tf.qualityScore(col("clean_text"))),
      "doc_id", "group_id", "q").localCheckpoint())
    val kept = Corpus.trainingFilter(canon, "doc_id", "clean_text", 0.45, 10, 100000)
      .select(col("doc_id"), col("n_bpe_tokens"))
      .join(canon.select("doc_id", "lang", "clean_text"), Seq("doc_id"))
    t("filter+join")(kept.count())
    val mixed = Corpus.mixtureSample(kept, "doc_id", "lang", "mix", 10,
      Map("en" -> 10, "de" -> 5, "fr" -> 5, "es" -> 3))
    val train = Corpus.splitByHash(mixed, "doc_id", "sp",
        Seq(("train", 8), ("val", 1), ("test", 1)))
      .filter(col("split") === "train")
      .withColumn("shard", Corpus.hashBucket(col("doc_id"), "shard", 4))
    val trainCk = t("mixture+split ckpt")(train.localCheckpoint())
    val bins = Corpus.packGreedy(trainCk, "doc_id", "n_bpe_tokens",
      "shard", Seq("doc_id"), 2000)
    val packed = Corpus.materializePacked(
        trainCk.join(bins.drop("shard"), Seq("doc_id")),
        "doc_id", "clean_text", "shard", "bin_id")
      .withColumn("pack_id", concat_ws("/", col("shard"), col("bin_id")))
    val ranked = Corpus.epochOrder(packed, "pack_id", "shard", 1)
    val out = packed.join(ranked.select("pack_id", "epoch_rank"), Seq("pack_id"))
      .select(col("shard"), col("bin_id"), col("n_docs"),
        col("epoch_rank"), col("packed_text"))
    t("pack+rank+out")(out.write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
