package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Dev-only plan/timing explorer (not part of the driver contract). */
object Explore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[explore] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val doc = Tables.table(spark, sfDir, "documents")
    val sh = Dedup.shingleIndex(doc, "doc_id", "text")
    time("shingleIndex count")(sh.count())
    time("shingleIndex count again")(sh.count())
    val co = Dedup.cooccurrence(sh)
    time("cooccurrence")(co.write.format("noop").mode("overwrite").save())
    time("jaccard full")(Dedup.ngramJaccardPairs(doc, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignature(doc, "doc_id", "text")
    time("minhash signature")(sig.write.format("noop").mode("overwrite").save())
    val cand = Dedup.lshCandidatePairs(sig)
    time("lsh candidates")(println("cand=" + cand.count()))
    time("minhash full")(Dedup.minhashDedup(doc, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    println("--- cooccurrence plan ---")
    co.explain("formatted")
    spark.stop()
  }
}
