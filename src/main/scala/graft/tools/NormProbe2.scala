package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev tool: stage-level shape comparison of the MinHash pipeline on
  * raw vs stripped+normalized text (shingle volume, candidate count).
  */
object NormProbe2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val tf = graft.functions.TextFunctions
    val raw = Tables.table(s, d, "documents")
    val normed = raw.select(col("doc_id"),
        tf.stripMarkup(
          concat(lit("<div class=\"doc\"><p>"), col("text"),
            lit("</p></div> source: https://example.com/doc?id="),
            col("doc_id"),
            lit(" &amp; more&nbsp;it&#39;s &#x2019;quoted&#x2019;")))
          .as("clean_text"))
      .withColumn("norm_text", tf.normalizeText(col("clean_text")))
    Seq(("raw", raw, "text"), ("norm", normed, "norm_text")).foreach {
      case (name, df, tc) =>
        val t0 = System.nanoTime()
        val sh = Dedup.shingleIndex(df, "doc_id", tc).persist()
        val nsh = sh.count()
        val t1 = System.nanoTime()
        val sig = Dedup.signatureFromIndex(sh)
        val cand = Dedup.lshCandidatePairs(sig).count()
        val t2 = System.nanoTime()
        println(f"[probe2] $name%-5s shingles=$nsh%9d (${(t1-t0)/1e9}%5.2f s)  candidates=$cand%7d (${(t2-t1)/1e9}%5.2f s)")
        sh.unpersist()
    }
    s.stop()
  }
}
