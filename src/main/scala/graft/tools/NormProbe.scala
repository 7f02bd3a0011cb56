package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev tool: is MinHash over the llm-pipeline's stripped+normalized
  * text materially slower than over raw text? (Separates data-shape
  * cost from machine-load noise.)
  */
object NormProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val tf = graft.functions.TextFunctions
    def time(name: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"[norm] $name run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n pairs)")
    }
    val raw = Tables.table(s, d, "documents")
    val normed = raw.select(col("doc_id"),
        tf.stripMarkup(
          concat(lit("<div class=\"doc\"><p>"), col("text"),
            lit("</p></div> source: https://example.com/doc?id="),
            col("doc_id"),
            lit(" &amp; more&nbsp;it&#39;s &#x2019;quoted&#x2019;")))
          .as("clean_text"))
      .withColumn("norm_text", tf.normalizeText(col("clean_text")))
    time("raw text     ")(graft.operators.Dedup
      .minhashDedup(raw, "doc_id", "text").count())
    time("wrapped+norm ")(graft.operators.Dedup
      .minhashDedup(normed, "doc_id", "norm_text").count())
    val normedFanned = Tables.fanOut(raw).select(col("doc_id"),
        tf.stripMarkup(
          concat(lit("<div class=\"doc\"><p>"), col("text"),
            lit("</p></div> source: https://example.com/doc?id="),
            col("doc_id"),
            lit(" &amp; more&nbsp;it&#39;s &#x2019;quoted&#x2019;")))
          .as("clean_text"))
      .withColumn("norm_text", tf.normalizeText(col("clean_text")))
    time("fanout->norm ")(graft.operators.Dedup
      .minhashDedup(normedFanned, "doc_id", "norm_text").count())
    s.stop()
  }
}
