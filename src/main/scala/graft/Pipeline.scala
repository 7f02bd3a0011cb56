package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** The end-to-end medallion pipeline — the library's analog of the
  * reference's Airflow DAG (airflow/dags/bigquery_weather_dag.py:
  * bronze_ingest → bronze_to_silver → silver_to_gold, daily).
  *
  * Stages are plain functions over DataFrames with explicit
  * dependencies; an orchestrator (Airflow, cron, Structured Streaming
  * `availableNow` trigger) schedules them. Each stage writes a
  * partitioned lakehouse layout so the next stage's incremental read
  * is partition-pruned.
  */
object Pipeline {

  /** Bronze: land raw tables + lineage columns as CSV (the reference's
    * bronze drop format, bucket.py:36), partitioned by ingestion date.
    */
  def bronze(spark: SparkSession, sfDir: String, outDir: String,
             ingestionDate: String): Unit = {
    val enriched = Tables.table(spark, sfDir, "nation")
      .withColumn("_source", lit("testdata"))
      .withColumn("_ingestion_date", lit(ingestionDate))
    Tables.writeCsv(enriched, s"$outDir/bronze/nation")
    val ev = Bronze.eventsFlattened(spark, sfDir)
      .withColumn("_source", lit("testdata"))
      .withColumn("_ingestion_date", lit(ingestionDate))
    Tables.writeCsv(ev, s"$outDir/bronze/events_flat")
  }

  /** Silver: schema'd bronze read → full cleaning pipeline → parquet.
    */
  def silver(spark: SparkSession, outDir: String,
             processingDate: String): Unit = {
    val nation = Tables.readCsv(spark, s"$outDir/bronze/nation",
      Some("n_nationkey INT, n_name STRING, n_regionkey INT, " +
        "_source STRING, _ingestion_date DATE"))
    Tables.writeParquet(Cleaning.silverPipeline(nation, processingDate),
      s"$outDir/silver/nation")
  }

  /** Gold: star-schema dimensions + fact from silver inputs. */
  def gold(spark: SparkSession, sfDir: String, outDir: String,
           modelingDate: String): Unit = {
    Tables.writeParquet(StarSchema.dimDate(spark, sfDir),
      s"$outDir/gold/dim_date")
    Tables.writeParquet(StarSchema.dimCustomer(spark, sfDir),
      s"$outDir/gold/dim_customer")
    Tables.writeParquet(StarSchema.factSales(spark, sfDir, modelingDate),
      s"$outDir/gold/fact_sales")
  }

  /** Retry wrapper for a pipeline stage (reference:
    * airflow/dags/bigquery_weather_dag.py `retries` / `retry_delay`):
    * re-runs the stage up to `maxAttempts` times, rethrowing the last
    * failure. Stages here are safe to retry because every write is
    * overwrite-mode (idempotent) — the same property that lets a real
    * orchestrator re-run a failed task.
    */
  def withRetries[T](maxAttempts: Int = 3, delayMs: Long = 0L)
                    (stage: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return stage
      catch {
        // NonFatal only: retrying after OutOfMemoryError/interrupt re-runs
        // a stage inside a possibly-broken JVM, and control throwables
        // (non-local return) must escape untouched
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < maxAttempts && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw last
  }

  /** Cadence catch-up computation — the scheduling semantics of the
    * reference DAG (airflow/dags/bigquery_weather_dag.py:23
    * `schedule='@daily'`, `catchup`) as a pure function for whatever
    * loop invokes [[run]]: the logical run instants on the cadence
    * grid anchored at `start` that are due — strictly after `lastRun`
    * (or from `start` when there has never been a run) and at-or-
    * before `now`. `catchup = false` is Airflow's catchup=False: skip
    * the backlog, keep only the most recent due run. Driver-side by
    * nature (a bounded list of instants, no data touched) — the
    * actual stage execution stays fully distributed.
    */
  def dueRuns(schedule: String, start: java.time.Instant,
              lastRun: Option[java.time.Instant],
              now: java.time.Instant,
              catchup: Boolean = true): Seq[java.time.Instant] = {
    val step = schedule match {
      case "@hourly" => java.time.Duration.ofHours(1)
      case "@daily"  => java.time.Duration.ofDays(1)
      case "@weekly" => java.time.Duration.ofDays(7)
      case other => throw new IllegalArgumentException(
        s"unsupported schedule: $other (use @hourly/@daily/@weekly)")
    }
    // first due grid point: the one strictly after lastRun (a lastRun
    // off the grid rounds up to the next grid point), or `start` when
    // no run ever happened; lastRun before `start` never rewinds
    val first = lastRun match {
      case Some(lr) if !lr.isBefore(start) =>
        val k = java.time.Duration.between(start, lr).toMillis /
          step.toMillis
        start.plus(step.multipliedBy(k + 1))
      case _ => start
    }
    val due = Iterator.iterate(first)(_.plus(step))
      .takeWhile(!_.isAfter(now)).toSeq
    if (catchup || due.isEmpty) due else Seq(due.last)
  }

  /** Run all three stages in dependency order (each stage retried like
    * the reference DAG's task retries); returns the gold fact for
    * inspection.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          runDate: String, maxAttempts: Int = 3): DataFrame = {
    withRetries(maxAttempts)(bronze(spark, sfDir, outDir, runDate))
    withRetries(maxAttempts)(silver(spark, outDir, runDate))
    withRetries(maxAttempts)(gold(spark, sfDir, outDir, runDate))
    spark.read.parquet(s"$outDir/gold/fact_sales")
  }

  // ---- The same medallion pattern applied to the CORPUS domain ----
  // (the warehouse DAG above mirrors the reference's weather ETL; this
  // one is what the identical orchestration looks like when the "gold"
  // product is a packed training set instead of a star schema)

  /** Corpus bronze: land raw documents with lineage columns. */
  def corpusBronze(spark: SparkSession, sfDir: String, outDir: String,
                   ingestionDate: String): Unit =
    Tables.writeParquet(
      Tables.table(spark, sfDir, "documents")
        .withColumn("_source", lit("testdata"))
        .withColumn("_ingestion_date", lit(ingestionDate)),
      s"$outDir/bronze/documents")

  /** Corpus silver: strip markup, normalize, exact-dedup to one
    * canonical (best-quality) document per normalized text, carrying
    * the computed quality score forward so gold never recomputes it.
    */
  def corpusSilver(spark: SparkSession, outDir: String,
                   processingDate: String): Unit = {
    val tf = graft.functions.TextFunctions
    val cleaned = spark.read.parquet(s"$outDir/bronze/documents")
      .select(col("doc_id"), col("lang"),
        tf.stripMarkup(col("text")).as("clean_text"))
      .withColumn("norm_text", tf.normalizeText(col("clean_text")))
      .withColumn("grp", sha2(col("norm_text"), 256))
      .withColumn("q", tf.qualityScore(col("clean_text")))
    Tables.writeParquet(
      Dedup.keepCanonical(cleaned, "doc_id", "grp", "q")
        .drop("grp", "norm_text")
        .withColumn("_processing_date", lit(processingDate)),
      s"$outDir/silver/documents")
  }

  /** Corpus gold: training filter → language mixture → train split →
    * greedy pack → packed rows with a deterministic epoch order — the
    * publishable training-set table.
    */
  def corpusGold(spark: SparkSession, outDir: String,
                 modelingDate: String, epoch: Int = 1): Unit = {
    val tf = graft.functions.TextFunctions
    val R = Corpus.TrainingRecipe
    val silver = spark.read.parquet(s"$outDir/silver/documents")
    val kept = silver
      .withColumn("n_bpe_tokens",
        tf.bpeTokenCount(col("clean_text")).cast("bigint"))
      .filter(col("q") >= R.MinQuality &&
        col("n_bpe_tokens").between(R.MinTokens, R.MaxTokens))
    val train = Corpus.splitByHash(
        Corpus.mixtureSample(kept, "doc_id", "lang", R.MixtureSalt,
          R.MixtureDen, R.MixtureRates.toMap),
        "doc_id", R.SplitSalt, R.SplitWeights)
      .filter(col("split") === "train")
      .withColumn("shard",
        Corpus.hashBucket(col("doc_id"), R.ShardSalt, R.Shards))
      .localCheckpoint() // two consumers: pack assignment + join-back
    val bins = Corpus.packGreedy(train, "doc_id", "n_bpe_tokens",
      "shard", Seq("doc_id"), R.PackBudget)
    val packed = Corpus.materializePacked(
        train.join(bins.drop("shard"), Seq("doc_id")),
        "doc_id", "clean_text", "shard", "bin_id")
      .withColumn("pack_id", concat_ws("/", col("shard"), col("bin_id")))
    val ranked = Corpus.epochOrder(packed, "pack_id", "shard", epoch)
    Tables.writeParquet(
      packed.join(ranked.select("pack_id", "epoch_rank"), Seq("pack_id"))
        .select(col("shard"), col("bin_id"), col("n_docs"),
          col("epoch_rank"), col("packed_text"))
        .withColumn("_modeling_date", lit(modelingDate)),
      s"$outDir/gold/train_packed")
  }

  /** Corpus-domain DAG run (bronze → silver → gold with retries, same
    * orchestration contract as [[run]]); returns the packed training
    * set.
    */
  def runCorpus(spark: SparkSession, sfDir: String, outDir: String,
                runDate: String, epoch: Int = 1,
                maxAttempts: Int = 3): DataFrame = {
    withRetries(maxAttempts)(corpusBronze(spark, sfDir, outDir, runDate))
    withRetries(maxAttempts)(corpusSilver(spark, outDir, runDate))
    withRetries(maxAttempts)(corpusGold(spark, outDir, runDate, epoch))
    spark.read.parquet(s"$outDir/gold/train_packed")
  }
}
