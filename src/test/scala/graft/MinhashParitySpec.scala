package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential parity for the r19 MinHash window kernel
  * (graft.plans.MinhashSlices): the long windows + "%08x" rendering
  * must be VALUE-IDENTICAL to `substring(sha2(s, 256), 1 + 3i, 8)`
  * per row, and the long-min signature must reproduce the string-min
  * signature per document — on the real corpus's shingle index and
  * on adversarial edge strings. The oracle sweep re-proves the
  * end-to-end pair sets; this pins the kernel contract itself.
  */
class MinhashParitySpec extends AnyFunSuite {
  import SparkTestSession._

  private val edge = Seq(
    "", " ", "a", "中文 漢字", "😀", "a b c", "ß", "�",
    "the quick brown fox", "0000000", "ffff ffff")

  private def shingles = {
    val docs = sources.Tables
      .table(spark, "/root/testdata/sf0.01", "documents")
    val real = operators.Dedup.shingleIndex(docs, "doc_id", "text")
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(
        edge.zipWithIndex.map { case (s, i) =>
          org.apache.spark.sql.Row(-(i + 1).toLong, s)
        }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sh",
          org.apache.spark.sql.types.StringType))))
    real.unionByName(e)
  }

  test("minhash_longs + %08x == substring(sha2-hex, 1+3i, 8) per row") {
    val k = 16
    val d = shingles.select(col("sh"),
      graft.plans.MinhashSlicesApi.minhash_longs(col("sh"), k).as("xs"),
      sha2(col("sh"), 256).as("dg"))
    val diffs = d.filter(not(
      (0 until k).map(i =>
        format_string("%08x", element_at(col("xs"), i + 1)) <=>
          substring(col("dg"), 1 + 3 * i, 8)).reduce(_ && _)))
    val bad = diffs.limit(5).collect()
    assert(bad.isEmpty, s"window mismatch on: ${bad.mkString("; ")}")
  }

  test("long-min signature == string-min signature per document") {
    val k = 16
    val sh = shingles
    val kernel = operators.Dedup.signatureFromIndex(sh, k)
    val legacy = sh.withColumn("dg", sha2(col("sh"), 256))
      .groupBy(col("sid"))
      .agg(
        min(substring(col("dg"), 1, 8)).as("mh0"),
        (1 until k).map(i =>
          min(substring(col("dg"), 1 + 3 * i, 8)).as(s"mh$i")): _*)
    assert(kernel.schema == legacy.schema,
      s"schema drift: ${kernel.schema} vs ${legacy.schema}")
    assert(kernel.exceptAll(legacy).isEmpty &&
      legacy.exceptAll(kernel).isEmpty,
      "signature rows differ between the long-min kernel and the " +
        "legacy string-min aggregation")
  }
}
