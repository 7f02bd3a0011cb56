package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.plans.{CountInSet, SumStringLengths}
import graft.sources.Tables

/** Value-parity specs for the codegen token-stat expressions that
  * replaced the interpreted HOF lambdas (stopword count, token-length
  * sum). These sit under four driver gates (q_text_quality,
  * q_corpus_filter, q_corpus_weighted, q_corpus_curriculum), so the
  * replacement must be bit-identical — each test pins the new
  * expression against the original `filter`/`aggregate` HOF form on
  * real testdata plus adversarial edges (unicode, empties, nulls).
  */
class TokenStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val allStop = TextFunctions.Stopwords.flatMap(_._2).distinct

  private def hofStopCount(arr: org.apache.spark.sql.Column) = {
    val wordsArr = array(allStop.map(lit): _*)
    size(filter(arr, t => array_contains(wordsArr, t)))
  }

  private def hofLenSum(arr: org.apache.spark.sql.Column) =
    aggregate(transform(arr, t => length(t)), lit(0), (acc, x) => acc + x)

  test("CountInSet matches the HOF form on sf0.01 documents") {
    val doc = Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val ws = TextFunctions.tokens(col("text"))
    val mismatches = doc.select(
      CountInSet.count_in_set(ws, allStop).as("a"),
      hofStopCount(ws).as("b")).filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("SumStringLengths matches the HOF form on sf0.01 documents") {
    val doc = Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val ws = TextFunctions.tokens(col("text"))
    val mismatches = doc.select(
      SumStringLengths.sum_string_lengths(ws).as("a"),
      hofLenSum(ws).as("b")).filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("edge cases: unicode, empty string, punctuation-only") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "", "   ", "héllo wörld 中文 🎉",
      "...", "the the the", "a\tb\nc  d").toDF("t")
    val ws = TextFunctions.tokens(col("t"))
    val rows = df.select(
      CountInSet.count_in_set(ws, allStop).as("a"),
      hofStopCount(ws).as("b"),
      SumStringLengths.sum_string_lengths(ws).as("c"),
      hofLenSum(ws).as("d")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"stopword count mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"length sum mismatch: $r")
    }
  }

  test("null array in, null out (matching the HOF form)") {
    import spark.implicits._
    val df = Seq(Some("the fox"), None).toDF("t")
    val ws = TextFunctions.tokens(col("t"))
    val rows = df.select(
      CountInSet.count_in_set(ws, allStop).as("a"),
      SumStringLengths.sum_string_lengths(ws).as("c")).collect()
    assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("null ELEMENTS are skipped by CountInSet like a null predicate") {
    import spark.implicits._
    val df = Seq((1, Seq(Some("the"), None, Some("fox")))).toDF("i", "arr")
    val got = df.select(
      CountInSet.count_in_set(col("arr"), allStop).as("a"),
      hofStopCount(col("arr")).as("b")).head()
    assert(got.getInt(0) == 1 && got.getInt(1) == 1)
  }

  test("interpreted eval path agrees with codegen (CountInSet + SumStringLengths)") {
    // Force interpreted evaluation through the same helpers the
    // generated code calls, on the language-ID stopword tables.
    val set = CountInSet.buildSet(allStop)
    val samples = Seq("the la der le of und", "", "no stops here", "中文 的")
    samples.foreach { s =>
      val toks = s.trim.split("\\s+").filter(_.nonEmpty)
      val expCount = toks.count(allStop.contains)
      val expSum = toks.map(t => t.codePointCount(0, t.length)).sum
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
      assert(CountInSet.countIn(arr, set) == expCount, s"count for '$s'")
      assert(SumStringLengths.sumLengths(arr) == expSum, s"sum for '$s'")
    }
  }
}
