package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r18 single-task union–find branch of
  * [[graft.operators.Dedup.resolveGroups]] must produce EXACTLY the
  * labels the iterative min-propagation converges to — on the real
  * minhash pair graph and on adversarial synthetic graphs (chains
  * that need many propagation rounds, stars, disjoint cliques,
  * id-order-reversed edges). `tinyThreshold = -1` forces the
  * iterative path on the same inputs for the differential check.
  */
class ResolveGroupsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Dedup

  private def diff(ids: org.apache.spark.sql.DataFrame,
                   pairs: org.apache.spark.sql.DataFrame): Long = {
    val fast = Dedup.resolveGroups(ids, pairs)
    val iter = Dedup.resolveGroups(ids, pairs, tinyThreshold = -1L)
    fast.withColumnRenamed("group_id", "g1")
      .join(iter.withColumnRenamed("group_id", "g2"), Seq("id"), "full")
      .filter(not(col("g1") <=> col("g2"))).count()
  }

  test("union-find == iterative propagation on real minhash pairs") {
    val doc = sources.Tables.table(spark, "/root/testdata/sf0.01",
      "documents")
    val pairs = Dedup.minhashDedup(doc, "doc_id", "text")
      .select(col("id_a"), col("id_b")).localCheckpoint()
    assert(diff(doc.select(col("doc_id").as("id")), pairs) == 0)
  }

  test("union-find == iterative on chains, stars, cliques") {
    import spark.implicits._
    // a 60-node chain (worst case for round counts), a star centered
    // on the HIGHEST id (min must flow backwards), two cliques, and
    // edges listed high->low
    val chain = (1L until 60L).map(i => (i + 1, i))
    val star = (100L until 110L).map(i => (120L, i))
    val cliqueA = for (a <- 200L to 205L; b <- 200L until a) yield (a, b)
    val iso = Seq((300L, 301L))
    val pairs = (chain ++ star ++ cliqueA ++ iso).toDF("id_a", "id_b")
    val ids = (1L to 320L).toDF("id")
    assert(diff(ids, pairs) == 0)
    // spot-check the labels themselves
    val got = Dedup.resolveGroups(ids, pairs.toDF())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 60L).forall(got(_) == 1L))
    assert((100L until 110L).forall(got(_) == 100L) && got(120L) == 100L)
    assert((200L to 205L).forall(got(_) == 200L))
    assert(got(300L) == 300L && got(301L) == 300L)
    assert(got(310L) == 310L) // isolated id keeps itself
  }

  test("empty pair set: every id its own group (both paths)") {
    import spark.implicits._
    val ids = (1L to 5L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.resolveGroups(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }
}
