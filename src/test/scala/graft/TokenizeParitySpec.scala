package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential parity for the r18 scanner kernels
  * (graft.plans.Tokenize): each kernel must be VALUE-IDENTICAL to the
  * regex/HOF expression it replaced, on the real test corpus and on
  * adversarial edge strings (unicode, CJK, supplementary planes,
  * whitespace variants, leading/trailing separators, empties). The
  * oracle sweep re-proves end-to-end equality; this spec pins the
  * kernel-level contract so a drift is caught at the expression, not
  * three operators downstream.
  */
class TokenizeParitySpec extends AnyFunSuite {
  import SparkTestSession._

  import graft.functions.TextFunctions
  import graft.plans.TokenizeApi

  private val edge = Seq(
    "", " ", "   ", "\t", " \t ", "a", " a ", "\ta\t", "a b  c",
    "  hello,world!!  42x7 ", "tab\tsep\nnewlinevt\ffeed\rcr",
    "héllo wörld", "中文 漢字 text", "emoji 😀 mix",
    "😀😁", "a b", "ñ", "末尾中文",
    "123abc!?.., x9", "trailing space ", " leading", "double  space",
    "一鿿䷿ꀀ", "mixed中abc文12", "-", "--", "a-b_c",
    "", "ßß", "�", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢")

  private def corpusPlusEdges = {
    val docs = sources.Tables
      .table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("text"))
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(edge.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    docs.unionByName(e)
  }

  private def assertNoDiff(diff: org.apache.spark.sql.DataFrame): Unit = {
    val bad = diff.limit(5).collect()
    assert(bad.isEmpty, s"kernel/regex mismatch on: ${bad.mkString("; ")}")
  }

  test("bpe_tokenize == regexp_extract_all(BpePattern)") {
    val d = corpusPlusEdges.select(col("text"),
      TokenizeApi.bpe_tokenize(col("text")).as("k"),
      TextFunctions.regexExtractAll(col("text"),
        TextFunctions.BpePattern).as("r"))
    assertNoDiff(d.filter(not(col("k") <=> col("r"))))
  }

  test("ws_tokenize == split(trim, \\s+)") {
    val d = corpusPlusEdges.select(col("text"),
      TokenizeApi.ws_tokenize(col("text")).as("k"),
      split(trim(col("text")), "\\s+").as("r"))
    assertNoDiff(d.filter(not(col("k") <=> col("r"))))
  }

  test("shingles == transform/concat_ws HOF chain (n = 3 and 2)") {
    for (n <- Seq(2, 3)) {
      val hof = {
        val ws = col("ws")
        when(size(ws) < n, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), size(ws) - n),
            i => concat_ws(" ", (0 until n).map(j =>
              element_at(ws, i + j + 1)): _*)))
      }
      val d = corpusPlusEdges
        .select(TokenizeApi.ws_tokenize(col("text")).as("ws"))
        .select(col("ws"), TokenizeApi.shingles(col("ws"), n).as("k"),
          hof.as("r"))
      assertNoDiff(d.filter(not(col("k") <=> col("r"))))
    }
  }

  test("char-class counters == size(regexp_extract_all(...))") {
    val d = corpusPlusEdges.select(col("text"),
      TokenizeApi.count_ascii_letters(col("text")).as("ka"),
      size(TextFunctions.regexExtractAll(col("text"), "[A-Za-z]"))
        .as("ra"),
      TokenizeApi.count_non_alnum_ws(col("text")).as("kp"),
      size(TextFunctions.regexExtractAll(col("text"),
        "[^A-Za-z0-9\\s]")).as("rp"),
      TokenizeApi.count_cjk(col("text")).as("kz"),
      size(TextFunctions.regexExtractAll(col("text"),
        "[\\x{4e00}-\\x{9fff}]")).as("rz"))
    assertNoDiff(d.filter(not(col("ka") <=> col("ra")) ||
      not(col("kp") <=> col("rp")) || not(col("kz") <=> col("rz"))))
  }

  test("drop_indexed == filter/array_contains HOF on trim shapes") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(Seq("a", "b", "c", "d", "e"), Seq(0L, 2L)),
      Row(Seq("a", "b"), Seq.empty[Long]),
      Row(Seq.empty[String], Seq(1L)),
      Row(Seq("x", "y", "z"), Seq(0L, 1L, 2L)),
      Row(Seq("k"), Seq(5L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("ws", ArrayType(StringType)),
        StructField("pos", ArrayType(LongType)))))
    val d = df.select(
      graft.plans.DropIndexed.drop_indexed(col("ws"), col("pos")).as("k"),
      filter(col("ws"),
        (_, i) => not(array_contains(col("pos"), i.cast("bigint"))))
        .as("r"))
    assertNoDiff(d.filter(not(col("k") <=> col("r"))))
  }

  test("null propagates like the regex form") {
    val row = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(
        TokenizeApi.bpe_tokenize(col("text")).as("a"),
        TokenizeApi.ws_tokenize(col("text")).as("b"),
        TokenizeApi.count_ascii_letters(col("text")).as("c"),
        TokenizeApi.shingles(array().cast("array<string>"), 3).as("d"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
    assert(row.getSeq[String](3).isEmpty)
  }

  test("interpreted eval matches codegen (eval path used by filters)") {
    // force the interpreted path through a direct Expression eval
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- edge) {
      val u = UTF8String.fromString(s)
      val viaKernel = graft.plans.Tokenize.bpeTokenize(u)
      val viaRegex = TextFunctions.BpePattern.r
        .findAllIn(s).toSeq
      assert(viaKernel.numElements() == viaRegex.size,
        s"count mismatch on '$s'")
      (0 until viaKernel.numElements()).foreach { i =>
        assert(viaKernel.getUTF8String(i).toString == viaRegex(i),
          s"token $i mismatch on '$s'")
      }
    }
  }
}
