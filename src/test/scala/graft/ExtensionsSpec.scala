package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bronze

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("driver contract: every gate has an oracle, every oracle a gate") {
    // a queries key without oracleSql silently downgrades to a
    // rows-only check at the driver; an oracleSql key without a query
    // is dead SQL that drifts unnoticed — both are contract rot
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"gates without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without gate: ${(o -- q).toSeq.sorted}")
  }

  test("registered SQL functions work: min_rolling_hash and vector_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT min_rolling_hash('hello world hello world', 16) AS f, " +
        "vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getLong(0) ==
      graft.plans.MinRollingHash.minHash(
        "hello world hello world".getBytes("UTF-8"), 16))
    assert(r.getDouble(1) == 11.0)
    // default-k single-arg form
    assert(spark.sql("SELECT min_rolling_hash('abc') AS f").head().getLong(0) ==
      graft.plans.MinRollingHash.minHash("abc".getBytes("UTF-8"), 16))
  }

  test("registered SQL functions work: count_in_set and sum_string_lengths") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT count_in_set(array('the', 'fox', 'und'), array('the', 'und', 'le')) AS c, " +
        "sum_string_lengths(array('ab', 'cde', '')) AS s").head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 5)
    // non-literal word set is a usage error, not silent wrong counts
    val e = intercept[Exception] {
      spark.sql("SELECT count_in_set(array('a'), array(rand()::string))")
        .head()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("registered SQL aggregates work: freq_sketch and freq_sketch_merge") {
    GraftExtensions.register(spark)
    // 4×a, 2×b, 1×c at k=2: 'a' must survive (count > 7/3); exact
    // counts are lower-bounded, never exceeded
    val m = spark.sql(
      "SELECT freq_sketch(v, 2) AS sk FROM " +
        "VALUES ('a'),('a'),('b'),('a'),('b'),('c'),('a') AS t(v)")
      .selectExpr("explode(sk) AS (item, est)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.contains("a") && m("a") <= 4L && m.size <= 2)
    // merging two single-shard sketches keeps the combined heavy item
    val merged = spark.sql(
      "WITH s AS (SELECT grp, freq_sketch(v, 2) AS sk FROM VALUES " +
        "(0,'a'),(0,'a'),(0,'b'),(1,'a'),(1,'c'),(1,'a') AS t(grp, v) " +
        "GROUP BY grp) " +
        "SELECT freq_sketch_merge(sk, 2) AS sk FROM s")
      .selectExpr("explode(sk) AS (item, est)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.contains("a") && merged("a") <= 4L)
  }

  test("registered SQL aggregate works: topk_by") {
    GraftExtensions.register(spark)
    // top-2 by score desc, ties to the smallest id: (0.9,7) then the
    // 0.5 tie resolved to id 2
    val got = spark.sql(
      "SELECT topk_by(s, id, 2) AS tk FROM VALUES " +
        "(0.5d, 5L), (0.9d, 7L), (0.5d, 2L), (0.1d, 1L) AS t(s, id)")
      .selectExpr("inline(tk)")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((7L, 0.9), (2L, 0.5)))
  }

  test("vector_dot mixes float and double arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("f", "d")
    val got = df.select(
      graft.plans.VectorDot.vector_dot(col("f"), col("d"))).head().getDouble(0)
    assert(got == 1.0)
  }

  test("bronze flatten: json props → parent_child columns, distributed") {
    val out = Bronze.eventsFlattened(spark, sf)
    assert(out.columns.toSeq == Seq("event_id", "event_type", "props_k"))
    assert(out.filter(col("props_k").isNull).count() == 0)
  }

  test("flattenStructs handles nested structs with _ naming") {
    import spark.implicits._
    val df = Seq((1, ("x", (2.5, "y")))).toDF("id", "s")
      .select(col("id"), col("s._1").as("a"),
        struct(col("s._2._1").as("inner1"),
          struct(lit(7).as("deep")).as("nest")).as("outer"))
    val flat = Bronze.flattenStructs(df)
    assert(flat.columns.toSeq ==
      Seq("id", "a", "outer_inner1", "outer_nest_deep"))
  }
}
