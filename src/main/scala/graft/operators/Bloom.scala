package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** X3 — Bloom-filter–pruned join: the "runtime filter" pattern Spark
  * itself applies under `spark.sql.optimizer.runtime.bloomFilter`
  * (InjectRuntimeFilter), exposed as an explicit operator for the
  * cases the optimizer's heuristics miss — a selective build side that
  * is only KNOWN to be selective by the pipeline author, a probe scan
  * behind a view the injector won't cross, or a reusable sketch shared
  * by several probes.
  *
  * Why it matters at 100 TB: a fact⋈fact join shuffles BOTH sides on
  * the key; when the build side matches only a sliver of the probe,
  * the probe rows that can never match still pay the full shuffle.
  * The bloom sketch is a few MB of bits built with ONE distributed
  * aggregate (no row broadcast, no driver collect — it rides a scalar
  * subquery), and the probe filter runs codegen'd AT THE SCAN, so
  * non-matching rows die before the exchange. False positives only
  * cost wasted shuffle rows; the exact join removes them, so results
  * are EXACTLY the plain join's (which is what the DuckDB gate
  * checks).
  *
  * Uses Spark's own `BloomFilterAggregate`/`BloomFilterMightContain`
  * kernels (both codegen'd, the same ones InjectRuntimeFilter plants)
  * through the [[org.apache.spark.sql.GraftSqlBridge]].
  */
object Bloom {

  /** Aggregate column producing one binary bloom sketch of `key`
    * (xxhash64'd, matching Spark's runtime-filter hashing).
    */
  def keyBloomAgg(key: Column, expectedItems: Long): Column =
    GraftSqlBridge.toColumn(new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.toExpression(key))),
      expectedItems).toAggregateExpression())

  /** `might_contain(<scalar-subquery bloom>, xxhash64(key))` — true
    * for every key that MAY be in the sketch (never false for one
    * that is). `bloomScalar` must be a one-row one-column aggregate
    * such as [[keyBloomAgg]]'s result; Spark executes it once as a
    * scalar subquery and constant-folds the bits into the filter.
    */
  def mightContain(bloomScalar: DataFrame, key: Column): Column =
    GraftSqlBridge.toColumn(new BloomFilterMightContain(
      ScalarSubquery(bloomScalar.queryExecution.analyzed),
      new XxHash64(Seq(GraftSqlBridge.toExpression(key)))))

  /** Equi-join with the probe side pre-pruned by a bloom sketch of the
    * build side's keys. Result is IDENTICAL to the plain join —
    * the sketch only reduces how many probe rows reach the shuffle.
    * `expectedItems` sizes the sketch (bits ≈ items × 8 at the default
    * 3% fpp); overestimating costs memory, underestimating costs fpp.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      expectedItems: Long): DataFrame = {
    val bf = build.agg(keyBloomAgg(col(buildKey), expectedItems).as("bf"))
    // side-qualified keys so probeKey == buildKey (the common case for
    // a fact⋈fact key) doesn't hit AMBIGUOUS_REFERENCE at analysis —
    // same qualification EventStream.enrichStream uses
    val pruned = probe.filter(mightContain(bf, probe(probeKey)))
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
