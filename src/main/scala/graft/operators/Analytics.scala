package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Gold-layer warehouse analytics — the dashboard-feeding reports the
  * reference serves from BigQuery/Looker (reference: README.md "Etapas
  * §5", silver_to_gold.py writes the star schema those reports query).
  *
  * Numeric determinism: every money aggregate is computed in exact
  * DECIMAL arithmetic (sum order can't perturb the value) and only the
  * final, magnitude-bounded result is rounded / cast to double. This
  * makes results bit-identical across engines and across cluster sizes
  * — a 1000-executor run and a laptop run hash the same, which is what
  * lets a correctness gate (or a re-run at 100 TB) diff outputs at all.
  *
  * Scale notes: all three queries are scan → (broadcast-)join → partial
  * agg → final agg plans; no driver-side collection. Dimension sides
  * (region/nation/customer at warehouse scale) are broadcast so the
  * 100 TB fact side never shuffles for the join — only the final
  * group-by shuffles, after map-side partial aggregation has collapsed
  * each partition to its group cardinality.
  */
object Analytics {
  private def dec(c: Column, p: Int = 12, s: Int = 2): Column =
    c.cast(s"decimal($p,$s)")

  /** The discounted extended price in exact decimal — the
    * oracle-parity-critical expression (the decimal(4,2) cast IS the
    * contract with the DuckDB SQL); shared by every revenue aggregate
    * so it can never drift per-query.
    */
  private def discPrice: Column =
    graft.plans.Decimal128Api.mul_compact(dec(col("l_extendedprice")),
      (lit(1) - col("l_discount")).cast("decimal(4,2)"))
  // mul_compact (graft.plans.Decimal128) is the bit-identical
  // integer twin of the decimal multiply for products that fit 18
  // digits — same result type and values, no per-row BigDecimal (see
  // Decimal128 scaladoc; parity pinned by Decimal128Spec + the
  // oracle sweep). The sums stay Spark's `sum`: at these magnitudes
  // the accumulator rides Decimal's compact long fast path.

  /** Exact decimal sum, rounded to `scale`, emitted as double.
    * Deterministic: the decimal sum is exact; round bounds magnitude so
    * the decimal→double conversion is exact-rational and identical in
    * any IEEE-754 engine.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    round(sum(dec(c)), scale).cast("double")

  private def davg(c: Column, scale: Int = 6): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), scale)

  /** Pricing summary report (flagship; TPC-H Q1 shape) — the "summary
    * by category over a date range" report pattern the reference's
    * dashboard runs over fact_weather.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(discPrice), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(discPrice *
          (lit(1) + col("l_tax")).cast("decimal(4,2)")), 2)
          .cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top unshipped orders by revenue (TPC-H Q3 shape) — "top N entities
    * by measure" dashboard pattern; customer ⋈ orders ⋈ lineitem.
    * The customer (dimension) side is broadcast: at 100 TB the lineitem
    * fact never shuffles for this join.
    */
  def topOrders(spark: SparkSession, sfDir: String, limit: Int = 10): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    val cust = Tables.table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // orders is a FACT: at warehouse scale it cannot be broadcast, so
    // the lineitem⋈orders join shuffles on the order key (AQE will
    // still broadcast it when the filtered side turns out tiny).
    // customer is the dimension side — explicit broadcast.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(discPrice), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(limit)
  }

  /** Forecast-revenue-change report (TPC-H Q6 shape): a pure
    * filter-and-aggregate whose predicates all push into the parquet
    * scan — at 100 TB the whole query is a pruned columnar scan plus
    * one scalar partial-agg merge, no shuffle of data rows at all.
    */
  def revenueChange(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(graft.plans.Decimal128Api.mul_compact(
        dec(col("l_extendedprice")),
        dec(col("l_discount"), 4, 2))), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Customer order-count distribution (TPC-H Q13 shape): left join so
    * zero-order customers count, then a distribution over the group
    * sizes — two aggregations, each shuffle bounded by its group
    * cardinality after map-side combine.
    */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.table(spark, sfDir, "customer")
    val ord = Tables.table(spark, sfDir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Star-join rollup: revenue by nation within a region (TPC-H Q5
    * shape) — the region/UF rollup the reference's dim_city enables
    * (silver_to_gold.py:88 nome_regiao/uf_sigla attributes exist
    * exactly for this report).
    */
  def regionVolume(spark: SparkSession, sfDir: String,
                   region: String = "ASIA"): DataFrame = {
    val reg = Tables.table(spark, sfDir, "region")
      .filter(col("r_name") === region)
    val nat = Tables.table(spark, sfDir, "nation")
    val sup = Tables.table(spark, sfDir, "supplier")
    val cust = Tables.table(spark, sfDir, "customer")
    val ord = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.table(spark, sfDir, "lineitem")
    // orders and customer are fact-sized at warehouse scale — shuffle
    // joins (AQE broadcasts them at bench scale automatically); the
    // true dimensions (supplier chain → nation → region) are broadcast.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(discPrice), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** G11 — top-N per group: rank within each group by `orderCols`
    * (must be a deterministic total order — include a tie-break key),
    * keep the first `n`. One shuffle on the group key; `row_number`
    * sorts within partitions only.
    */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[Column], n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= n)
  }

  /** G12 — month-over-month revenue with deltas: the lag-window report
    * shape (decimal-exact sums, explicit month ordering). Emits NULL
    * delta on each partition's first month rather than inventing a
    * zero.
    */
  def monthlyRevenueDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    // a NULL ship date would otherwise become a NULL month that sorts
    // first and silently seeds every real month's lag chain
    val monthly = li.filter(col("l_shipdate").isNotNull)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(round(sum(discPrice), 2)
        .as("rev"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ship_month"))
    // single-partition window is safe: month cardinality is bounded
    // (years × 12) no matter how big the fact table is
    monthly.select(col("ship_month"),
        col("rev").cast("double").as("revenue"),
        (col("rev") - lag(col("rev"), 1).over(w)).cast("double")
          .as("revenue_delta"))
  }

  /** G14b — hierarchical ROLLUP report: revenue by (region, nation)
    * with per-region subtotals and a grand total, the dashboard shape
    * `GROUP BY ROLLUP` exists for. The F-sized work is ONE plain
    * groupBy to the (region, nation) leaf aggregate — Spark's rollup
    * `Expand` (×3 row multiplication) then runs over the TINY leaf
    * table, never over the fact. Decimal-exact leaf sums make the
    * subtotal re-aggregation bit-stable. Subtotal rows surface as
    * `(all)` (no real region/nation carries that name).
    */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.table(spark, sfDir, "nation")
    val reg = Tables.table(spark, sfDir, "region")
    val cust = Tables.table(spark, sfDir, "customer")
    val ord = Tables.table(spark, sfDir, "orders")
    val li = Tables.table(spark, sfDir, "lineitem")
    val leaf = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(discPrice).as("rev"))
    leaf.rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("rev")), 2).cast("double").as("revenue"))
      .select(coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        col("revenue"))
  }

  /** G14c — full CUBE over (order priority, order status): every
    * subtotal combination in one pass, with `grouping_id` telling a
    * rolled-up dimension apart from a genuine value — the label trick
    * [[revenueRollup]] uses stops being enough once BOTH dimensions
    * can roll up independently (a row with priority set and status
    * rolled up has no position in a rollup's strict hierarchy).
    *
    * Scale shape: the fact table is reduced to the (|priority| ×
    * |status|) leaf grid FIRST (one map-side-combined groupBy); the
    * 4-way Expand that implements CUBE multiplies the LEAF, not the
    * fact scan — cube over a 15-row grid is free, cube directly over
    * the fact would 4× the shuffle input for nothing.
    */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.table(spark, sfDir, "orders")
    val leaf = ord.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    leaf.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n_orders"),
        round(sum(col("rev")), 2).cast("double").as("revenue"),
        grouping_id().cast("bigint").as("gid"))
      .select(coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("gid"), col("n_orders"), col("revenue"))
  }

  /** G14d — arbitrary GROUPING SETS: the general form CUBE and ROLLUP
    * are special cases of, for the report shapes neither expresses —
    * here the two independent one-dimension rollups ((priority),
    * (status)) computed in ONE pass (a CUBE would also pay for the
    * leaf grid and the grand total; two separate GROUP BYs would scan
    * twice). Same Expand-over-pre-aggregated-leaf shape as
    * [[revenueCube]]: the fact aggregates once to the leaf grid, and
    * Expand multiplies only those few rows — never the fact table.
    * `grouping_id` bit order (first column = MSB) matches the SQL
    * GROUPING() convention, which the oracle recomputes.
    */
  def revenueGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.table(spark, sfDir, "orders")
    val leaf = ord.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    leaf.groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(col("n")).as("n_orders"),
        round(sum(col("rev")), 2).cast("double").as("revenue"),
        grouping_id().cast("bigint").as("gid"))
      .select(coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("gid"), col("n_orders"), col("revenue"))
  }

  /** X3 demo — urgent-order line revenue with the fact scan pre-pruned
    * by a bloom sketch of the urgent order keys ([[Bloom]]): the
    * ~80% of lineitem rows whose order is not 1-URGENT are dropped
    * codegen'd at the scan, BEFORE the join shuffle. Result is exactly
    * the plain join's (bloom false positives die in the join), which
    * is what the oracle checks.
    */
  def bloomPriorityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = Tables.table(spark, sfDir, "lineitem")
    Bloom.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 1000000L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(discPrice), 2).cast("double").as("revenue"))
  }

  /** C8 — pivot reshape: order counts by year × priority with an
    * EXPLICIT pivot-value list (an open-ended pivot needs a full extra
    * pass to discover the domain, and unknown output schemas break
    * downstream plans — at scale the domain is always declared).
    */
  def ordersPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    Tables.table(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L, priorities)
  }

  /** G13 — conditional-aggregation join report (TPC-H Q12 shape):
    * per return flag, how many lineitems belong to high-priority vs
    * other orders. One fact⋈fact join (AQE-managed) + CASE sums with
    * map-side partials — the "pivot two classes into columns during
    * the aggregation" dashboard pattern.
    */
  def priorityLineReport(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag")
    val ord = Tables.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** E9 — cohort RETENTION: users bucketed by first-seen day, activity
    * counted per (cohort, day-offset) — the retention-curve input.
    * Two bounded aggregations: per-user first day (one shuffle on
    * user), then distinct (user, day) activity joined back and
    * aggregated to cohort×offset cells (cardinality ≤ days²,
    * independent of event volume).
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    // plain count is exact here: ev is distinct on (user_id, day), so
    // a user occupies each (cohort, offset) cell at most once — a
    // count_distinct would add a needless two-phase shuffle on
    // (group, user)
    ev.join(first, Seq("user_id"))
      .groupBy(col("cohort_day").cast("string").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint")
          .as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** C9 — unpivot (melt): the inverse reshape of [[ordersPivot]],
    * via Spark's native `unpivot`. Zero-count cells (pivot fill) are
    * dropped so the long form equals the direct group-by.
    */
  def ordersUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    ordersPivot(spark, sfDir)
      .unpivot(Array(col("order_year")), priorities.map(col).toArray,
        "priority", "n_orders")
      .filter(col("n_orders") > 0)
  }

  /** E8 — rolling 7-day aggregation per event type: a RANGE window
    * over integer day numbers (date-typed range frames behave
    * differently across engines; day ints don't). Emits rolling SUM
    * and day COUNT — sufficient statistics, not the average: a rounded
    * QUOTIENT is the one value two engines can round apart (see
    * Similarity.centroidUpdate), and the caller's division is exact on
    * the tiny result. Daily pre-aggregation bounds the window input at
    * days × types regardless of event volume.
    */
  def rollingDailyValue(spark: SparkSession, sfDir: String,
                        windowDays: Int = 7): DataFrame = {
    val daily = Tables.table(spark, sfDir, "events")
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .as("day_num"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("d_sum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-(windowDays - 1), 0)
    daily.select(col("event_type"), col("day_num").cast("bigint").as("day_num"),
      round(sum(col("d_sum")).over(w), 4).cast("double").as("rolling_sum"),
      count(lit(1)).over(w).cast("bigint").as("n_days"))
  }

  /** G10 — keyless RANGE JOIN (point-in-interval), bucketed. The naive
    * theta join `point BETWEEN start AND end` has no equi-key, so
    * Spark would plan a broadcast-nested-loop over |intervals|·|points|
    * pairs — the canonical scale-killer. Two rewrites stack here:
    *
    *  1. BUCKET: each interval explodes into its covered day buckets
    *     and the join key is the bucket — fan-out is the WINDOW LENGTH
    *     (bounded, chosen), not a table size.
    *  2. PRE-AGGREGATE the dense side: points collapse to per-day
    *     counts BEFORE the join. Without this the join's intermediate
    *     is Σ_day |intervals covering day|·|points on day| — measured
    *     ~1.1 BILLION rows on the 150k×600k test shape (234 s); with
    *     it, the join input is |intervals|·window rows against a
    *     calendar-bounded count table (broadcast — day cardinality is
    *     years×365 no matter how big the data), and the same query
    *     runs in ~2 s. Point volume now only affects the cheap
    *     up-front groupBy.
    *
    * `intervals` columns: `idCol`, `startCol` (date); the interval is
    * [start, start + windowDays] inclusive. `points` columns:
    * `dateCol` (date), `countCol` (non-null, counted per interval;
    * intervals with no points emit 0).
    */
  def rangeCountBucketed(intervals: DataFrame, idCol: String,
                         startCol: String, windowDays: Int,
                         points: DataFrame, dateCol: String,
                         countCol: String): DataFrame = {
    val daily = points.groupBy(col(dateCol).as("__day"))
      .agg(count(col(countCol)).as("__cnt"))
    // a NULL start explodes to one null-day row (instead of vanishing
    // with the null sequence), misses the join, and lands as count 0 —
    // matching the SQL LEFT JOIN contract
    val exploded = intervals.select(col(idCol),
      explode(coalesce(
        sequence(col(startCol), date_add(col(startCol), windowDays)),
        array(lit(null).cast("date")))).as("__day"))
    exploded.join(broadcast(daily), Seq("__day"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__cnt"), lit(0L))).cast("bigint")
        .as("n_points"))
  }

  /** Demand-window report over the testdata: for each order, how many
    * lineitems (any order's) shipped within 30 days of its order date.
    */
  def demandWindow(spark: SparkSession, sfDir: String,
                   windowDays: Int = 30): DataFrame = {
    val ord = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d0"))
    val li = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
    rangeCountBucketed(ord, "o_orderkey", "d0", windowDays,
      li, "sd", "l_orderkey")
      .withColumnRenamed("n_points", "n_shipped")
  }
}
