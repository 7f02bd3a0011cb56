package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Gold-layer star-schema modeling.
  *
  * Reference behavior: src/etl/silver_to_gold.py — dimensions are
  * `select(attrs).distinct()` plus a sha256 surrogate key over the
  * natural key (`sha2(concat_ws(":", keys), 256)`, silver_to_gold.py:96);
  * the fact recomputes each dimension's hash key inline from the
  * natural key it already carries (silver_to_gold.py:150) instead of
  * joining every dimension, and derives a composite
  * `id_fact = sha2(concat_ws("_", fk1, fk2, fk3), 256)`
  * (silver_to_gold.py:166); lineage columns `_source`,
  * `_ingestion_date`, `_processing_date`, `_modeling_date` ride along.
  *
  * Scale notes: the hash-recompute trick is the reason this design
  * holds at 100 TB — attaching three dimension FKs costs ZERO shuffles
  * (pure projection inside codegen), vs three join shuffles for the
  * lookup-table approach. Dimension builds shuffle only their distinct
  * natural-key set (tiny after map-side partial aggregation). When a
  * dimension IS needed on the fact (descriptive attrs), it is broadcast.
  */
object StarSchema {

  /** sha256 surrogate key over the natural key, reference encoding
    * (silver_to_gold.py:96): `:`-joined string forms.
    */
  def surrogateKey(naturalKey: Column*): Column =
    sha2(concat_ws(":", naturalKey.map(_.cast("string")): _*), 256)

  /** Composite fact id, reference encoding (silver_to_gold.py:166):
    * `_`-joined FK hashes.
    */
  def factId(fks: Column*): Column =
    sha2(concat_ws("_", fks: _*), 256)

  /** Dimension build: distinct attributes + surrogate key. */
  def dimension(df: DataFrame, attrs: Seq[String], naturalKey: Seq[String],
                idName: String): DataFrame =
    df.select(attrs.map(col): _*).distinct()
      .withColumn(idName, surrogateKey(naturalKey.map(col): _*))

  /** dim_date analog of the reference's dim_update_date /
    * dim_forecast_date (silver_to_gold.py:103): distinct dates keyed by
    * sha256 of their ISO form.
    */
  def dimDate(spark: SparkSession, sfDir: String): DataFrame =
    dimension(
      Tables.table(spark, sfDir, "orders")
        .select(col("o_orderdate").cast("date").as("data")),
      attrs = Seq("data"), naturalKey = Seq("data"), idName = "id_date")

  /** dim_weather_condition analog (silver_to_gold.py:120): the small
    * categorical dimension (brand × type).
    */
  def dimPart(spark: SparkSession, sfDir: String): DataFrame =
    dimension(Tables.table(spark, sfDir, "part"),
      attrs = Seq("p_brand", "p_type"),
      naturalKey = Seq("p_brand"), idName = "id_part_kind")

  /** dim_city analog (silver_to_gold.py:75): a conformed dimension
    * built by joining two sources on the natural key and coalescing
    * attributes. customer ⋈ nation ⋈ region mirrors ibge ⋈ cptec; the
    * small side is broadcast.
    */
  def dimCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.table(spark, sfDir, "customer")
    val nat = Tables.table(spark, sfDir, "nation")
    val reg = Tables.table(spark, sfDir, "region")
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .select(
        col("c_custkey").as("id_customer_nat"),
        col("c_name").as("nome"),
        col("n_name").as("nome_nacao"),
        col("r_name").as("nome_regiao"),
        col("c_mktsegment").as("segmento"))
      .withColumn("id_customer",
        surrogateKey(col("id_customer_nat"), col("nome_nacao")))
  }

  /** fact_weather analog (silver_to_gold.py:139): lineitem measures with
    * hash-recomputed FKs, a descriptive-attribute broadcast join (part
    * kind — the one the fact can't recompute), composite id_fact, and
    * lineage columns. `modelingDate` is injected for reproducibility
    * (the reference stamps wall-clock `today`, silver_to_gold.py:160).
    */
  def factSales(spark: SparkSession, sfDir: String,
                modelingDate: String = "2026-08-12"): DataFrame =
    factSalesFrom(Tables.table(spark, sfDir, "lineitem"),
      Tables.table(spark, sfDir, "part").select("p_partkey", "p_brand"),
      modelingDate)

  /** [[factSales]] with the inputs supplied directly — the seam the
    * incremental DAG uses to build fact rows for a lineitem BATCH (an
    * as-of partition slice, S7) instead of the whole table.
    * `withShipMonth = true` additionally carries `ship_month`
    * (`yyyy-MM` of l_shipdate) — the partition key the manifest-table
    * fact needs for partition-scoped daily promotions (the
    * reference's fact load is partition-append by date,
    * bigquery.py:141; a hash FK cannot partition, so the natural
    * date rides along).
    */
  def factSalesFrom(lineitem: DataFrame, partKind: DataFrame,
                    modelingDate: String,
                    withShipMonth: Boolean = false): DataFrame = {
    val li = Tables.fanOut(lineitem)
    // part is ~1% of lineitem — no forced broadcast; AQE broadcasts it
    // while it fits and degrades to a shuffle join when it doesn't.
    val base = li
      .join(partKind, li("l_partkey") === partKind("p_partkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(12,2)").cast("double")
          .as("quantidade"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double")
          .as("preco"),
        // FK hashes recomputed inline — zero-shuffle FK attachment:
        surrogateKey(col("l_shipdate").cast("date")).as("id_ship_date"),
        surrogateKey(col("p_brand")).as("id_part_kind"),
        surrogateKey(col("l_orderkey"), col("l_suppkey")).as("id_supply"),
        col("l_shipdate").cast("date").as("__ship_date"))
      .withColumn("_source", lit("lineitem"))
      .withColumn("_modeling_date", lit(modelingDate).cast("date"))
      .withColumn("id_fact",
        factId(col("id_ship_date"), col("id_part_kind"), col("id_supply")))
    if (withShipMonth)
      base.withColumn("ship_month",
        date_format(col("__ship_date"), "yyyy-MM")).drop("__ship_date")
    else base.drop("__ship_date")
  }

  /** G14 — SCD Type-2 dimension versioning: turn an append-only change
    * stream `(key, change_ts, attrs…)` into versioned dimension rows
    * with `[effective_from, effective_to)` validity and an
    * `is_current` flag — the standard way a warehouse keeps attribute
    * HISTORY where the reference's dimensions keep only the latest
    * state (silver_to_gold.py:96 rebuilds dims from the newest
    * snapshot).
    *
    * ONE window over (key ORDER BY ts, tieBreak) — a single shuffle on
    * the key, no self-join; `lead` closes each version with its
    * successor's start. `tieBreak` must make the per-key order total
    * (same-timestamp changes would otherwise order arbitrarily per
    * run).
    *
    * `changedOnly = true` is textbook SCD2: a change row whose tracked
    * attributes EQUAL the previous row's (a no-op touch, the common
    * case when upstream re-emits unchanged records) does not open a
    * new version — it is dropped before versioning, so the prior
    * version's validity simply extends through it. Implemented as a
    * `lag` compare of the attr struct over the SAME window (null-safe,
    * so null attribute values compare stably) — the filter sits
    * between two window functions on one partitioning + ordering, and
    * Spark satisfies the second window from the first's sort: still a
    * single shuffle.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
           tieBreak: Column, attrCols: Seq[String],
           changedOnly: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), tieBreak)
    val changes = if (!changedOnly) df else {
      val attrs = struct(attrCols.map(col): _*)
      // keep a row iff it's the key's first or its attrs differ from
      // the predecessor's (<=> : first-row lag is null, never equal)
      df.withColumn("__same", attrs <=> lag(attrs, 1).over(w))
        .filter(!col("__same")).drop("__same")
    }
    // window BEFORE the projection: tieBreak may be a column that is
    // not among the kept attrs
    changes.withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select((Seq(keyCol) ++ attrCols ++
        Seq(tsCol, "effective_to", "is_current")).map(col): _*)
      .withColumnRenamed(tsCol, "effective_from")
  }
}
