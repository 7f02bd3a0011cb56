package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare
  * gate (omitted only for ops whose hashing/bucketing is
  * Spark-specific — those get the weaker rows-only check).
  *
  * Determinism rules that make the hash gate meaningful (and make a
  * 100 TB re-run diffable): wall-clock stamps are injected constants,
  * float aggregates run in exact decimal, and every column is aliased
  * identically in the Spark plan and the oracle SQL.
  */
object SparkEntry {
  private val Stamp = "2026-08-12" // injected _processing/_modeling date

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 G5–G7 warehouse analytics ----
    "q_pricing_summary" -> ((s, d) => Analytics.pricingSummary(s, d)),
    "q_top_orders"      -> ((s, d) => Analytics.topOrders(s, d)),
    "q_region_volume"   -> ((s, d) => Analytics.regionVolume(s, d)),
    // ---- §2.2 C1–C6 silver cleaning ----
    "q_clean_nulls" -> ((s, d) =>
      Cleaning.removeNullRows(Tables.table(s, d, "customer"))),
    "q_clean_trim" -> ((s, d) =>
      Cleaning.trimStrings(Tables.table(s, d, "documents"))),
    "q_dedup_exact_rows" -> ((s, d) =>
      Cleaning.dedupExact(Tables.table(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity"))),
    "q_clean_columns" -> ((s, d) =>
      Cleaning.normalizeColumnNames(
        Cleaning.dropColumns(Tables.table(s, d, "part"), Seq("p_size")),
        Map("p_name" -> "part_name"))),
    "q_multiformat_date" -> ((s, d) => {
      // Bronze dates arrive in three formats (reference:
      // bronze_to_silver.py:47); synthesize the mess, then parse it back.
      val ord = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("dt"))
      val messy = ord.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, date_format(col("dt"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("dt"), "dd/MM/yyyy"))
          .otherwise(date_format(col("dt"), "MM-dd-yyyy")).as("raw"))
      messy.select(col("o_orderkey"),
        Cleaning.parseDateMulti(col("raw")).cast("string").as("parsed_date"))
    }),
    "q_silver_pipeline" -> ((s, d) =>
      Cleaning.silverPipeline(Tables.table(s, d, "documents"), Stamp)
        .withColumn("_processing_date", col("_processing_date").cast("string"))),
    // ---- §2.3 P1–P4 profiling ----
    "q_profile"       -> ((s, d) => Profiling.profile(Tables.table(s, d, "orders"))),
    "q_unique_counts" -> ((s, d) => Profiling.uniqueCounts(Tables.table(s, d, "customer"))),
    // (on orders the audit legitimately fires: a customer maps to many
    // orders — demonstrating violation *detection*, reference
    // bronze_to_silver.py:127)
    "q_consistency"   -> ((s, d) =>
      Profiling.consistency(Tables.table(s, d, "orders"),
        "o_custkey", "o_orderkey")),
    "q_completeness"  -> ((s, d) => Profiling.completeness(Tables.table(s, d, "events"))),
    // ---- §2.4 G1–G4 star schema ----
    "q_dim_date"     -> ((s, d) => StarSchema.dimDate(s, d)
      .withColumn("data", col("data").cast("string"))),
    "q_dim_part"     -> ((s, d) => StarSchema.dimPart(s, d)),
    "q_dim_customer" -> ((s, d) => StarSchema.dimCustomer(s, d)),
    "q_fact_sales"   -> ((s, d) => StarSchema.factSales(s, d, Stamp)
      .withColumn("_modeling_date", col("_modeling_date").cast("string"))),
    // ---- §2.1 S6–S7 incremental reads ----
    // (ts emitted second-truncated: the source parquet carries
    // nanosecond timestamps, which Spark reads at microsecond
    // precision — sub-second output would be engine-dependent.)
    "q_latest_partition" -> ((s, d) =>
      Incremental.latestPartition(
        Tables.table(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("props"),
            date_trunc("second", col("ts")).as("ts_sec"),
            col("ts").cast("date").cast("string").as("event_date")),
        col("event_date"))),
    "q_asof_partition" -> ((s, d) =>
      Incremental.asOfPartition(
        Tables.table(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("props"),
            date_trunc("second", col("ts")).as("ts_sec"),
            col("ts").cast("date").cast("string").as("event_date")),
        col("event_date"), lit("2024-01-15"))),
    // ---- §2.5 E1–E2 events ----
    "q_events_window"   -> ((s, d) => Events.hourlyRollup(s, d)),
    "q_events_sessions" -> ((s, d) => Events.sessionize(s, d)),
  )

  /** DuckDB oracle SQL, same column names as the Spark results. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_region_volume" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q_clean_nulls" ->
      """SELECT * FROM customer
        |WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        |  AND c_nationkey IS NOT NULL
        |  AND c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)
        |  AND c_mktsegment IS NOT NULL""".stripMargin,
    "q_clean_trim" ->
      """SELECT doc_id, TRIM(text) AS text, TRIM(lang) AS lang,
        |  TRIM(source) AS source, n_chars
        |FROM documents""".stripMargin,
    "q_dedup_exact_rows" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
    "q_clean_columns" ->
      """SELECT p_partkey, p_name AS part_name, p_brand, p_type,
        |  p_retailprice
        |FROM part""".stripMargin,
    "q_multiformat_date" ->
      """SELECT o_orderkey,
        |  CAST(COALESCE(
        |    try_strptime(raw, '%Y-%m-%d'),
        |    try_strptime(raw, '%d/%m/%Y'),
        |    try_strptime(raw, '%m-%d-%Y')) AS DATE) :: VARCHAR AS parsed_date
        |FROM (
        |  SELECT o_orderkey,
        |    CASE CAST(o_orderkey % 3 AS INT)
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
        |      ELSE strftime(o_orderdate, '%m-%d-%Y') END AS raw
        |  FROM orders) t""".stripMargin,
    "q_silver_pipeline" ->
      """SELECT DISTINCT doc_id, TRIM(text) AS text, TRIM(lang) AS lang,
        |  TRIM(source) AS source, n_chars,
        |  '2026-08-12' AS _processing_date
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
        |  AND source IS NOT NULL AND n_chars IS NOT NULL""".stripMargin,
    "q_profile" -> Seq(
      ("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)", "CAST(MAX(o_orderkey) AS VARCHAR)", "o_orderkey"),
      ("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)", "CAST(MAX(o_custkey) AS VARCHAR)", "o_custkey"),
      ("o_orderstatus", "CAST(MIN(o_orderstatus) AS VARCHAR)", "CAST(MAX(o_orderstatus) AS VARCHAR)", "o_orderstatus"),
      ("o_totalprice", "CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)", "CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)", "o_totalprice"),
      ("o_orderdate", "CAST(MIN(o_orderdate) AS VARCHAR)", "CAST(MAX(o_orderdate) AS VARCHAR)", "o_orderdate"),
      ("o_orderpriority", "CAST(MIN(o_orderpriority) AS VARCHAR)", "CAST(MAX(o_orderpriority) AS VARCHAR)", "o_orderpriority"),
    ).map { case (name, mn, mx, c) =>
      s"""SELECT '$name' AS column_name, COUNT($c) AS n_nonnull,
         |  COUNT(DISTINCT $c) AS n_distinct, $mn AS min_val, $mx AS max_val
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"),
    "q_unique_counts" -> Seq(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .map(c =>
        s"SELECT '$c' AS column_name, COUNT(DISTINCT $c) AS n_distinct FROM customer")
      .mkString("\nUNION ALL\n"),
    "q_consistency" ->
      """SELECT o_custkey, COUNT(DISTINCT o_orderkey) AS unique_ids
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(DISTINCT o_orderkey) <> 1""".stripMargin,
    "q_completeness" -> Seq(
      "event_id", "ts", "user_id", "event_type", "value", "props")
      .map(c =>
        s"""SELECT '$c' AS column_name, COUNT($c) AS n_nonnull,
           |  ROUND(CAST(COUNT($c) AS DOUBLE) / COUNT(*), 6) AS nonnull_ratio
           |FROM events""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q_dim_date" ->
      """SELECT CAST(data AS VARCHAR) AS data, sha256(CAST(data AS VARCHAR)) AS id_date
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS data FROM orders) t""".stripMargin,
    "q_dim_part" ->
      """SELECT p_brand, p_type, sha256(p_brand) AS id_part_kind
        |FROM (SELECT DISTINCT p_brand, p_type FROM part) t""".stripMargin,
    "q_dim_customer" ->
      """SELECT c_custkey AS id_customer_nat, c_name AS nome,
        |  n_name AS nome_nacao, r_name AS nome_regiao,
        |  c_mktsegment AS segmento,
        |  sha256(concat_ws(':', CAST(c_custkey AS VARCHAR), n_name)) AS id_customer
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q_fact_sales" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS quantidade,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS preco,
        |  sha256(CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS id_ship_date,
        |  sha256(p_brand) AS id_part_kind,
        |  sha256(concat_ws(':', CAST(l_orderkey AS VARCHAR), CAST(l_suppkey AS VARCHAR))) AS id_supply,
        |  'lineitem' AS _source,
        |  '2026-08-12' AS _modeling_date,
        |  sha256(concat_ws('_',
        |    sha256(CAST(CAST(l_shipdate AS DATE) AS VARCHAR)),
        |    sha256(p_brand),
        |    sha256(concat_ws(':', CAST(l_orderkey AS VARCHAR), CAST(l_suppkey AS VARCHAR))))) AS id_fact
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q_latest_partition" ->
      """SELECT event_id, user_id, event_type, value, props,
        |  date_trunc('second', ts) AS ts_sec, CAST(ts AS DATE) :: VARCHAR AS event_date
        |FROM events
        |WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)""".stripMargin,
    "q_asof_partition" ->
      """SELECT event_id, user_id, event_type, value, props,
        |  date_trunc('second', ts) AS ts_sec, CAST(ts AS DATE) :: VARCHAR AS event_date
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin,
    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM b
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  date_trunc('second', MIN(ts)) AS session_start,
        |  date_trunc('second', MAX(ts)) AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
  )
}
