package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.sources.ChangeFeed

/** The CHANGE FEED as a real Structured Streaming SOURCE (`graft-cdf`)
  * — the `readStream` form of [[graft.sources.ChangeFeed]], so
  * per-promotion diffs compose with watermarks, stream-stream joins,
  * `foreachBatch`, and every other streaming operator instead of
  * living in a driver-side consume loop:
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("keys", "n_nationkey")
  *     .load(tableRoot)          // snapshot OR manifest layout
  *     .writeStream.option("checkpointLocation", ck)...
  * }}}
  *
  * Model: OFFSETS ARE GENERATION NUMBERS. The table's committed
  * promotions are already a durable, totally-ordered, replayable log
  * (immutable generations behind one pointer), so the source needs no
  * state of its own: `getOffset` is one pointer read, a micro-batch
  * (start, end] is the union of those generations' S12 diffs (each
  * row stamped with its `graft_gen`), and Spark's own checkpointed
  * offset log replaces [[ChangeFeed.consume]]'s hand-rolled cursor —
  * exactly-once across restarts comes from the engine's offset
  * tracking plus the generations' immutability (re-reading gen g
  * yields the same diff bytes every time).
  *
  * Options: `path` (the table root — both pointer layouts work,
  * probed like [[graft.sources.SnapshotSource]]), `keys` (the diff
  * key columns, comma-separated), `startGen` (serve only promotions
  * AFTER this generation — "from now" = the serving gen; omit for the
  * full-sync bootstrap: the oldest retained generation delivered as
  * all-`added` rows, then diffs take over, the
  * [[ChangeFeed.consume]] first-contact contract), and
  * `maxGensPerTrigger` (ADMISSION CONTROL: cap the generations one
  * micro-batch drains, so a consumer restarting N promotions behind
  * catches up in ceil(N / max) bounded batches instead of one
  * N-promotion union plan — the maxFilesPerTrigger discipline; the
  * cap is applied at OFFSET time, never inside a planned batch, so
  * the checkpointed offset log always names exactly what was
  * delivered).
  *
  * Retention honesty rides through [[ChangeFeed.changesAt]]: a
  * restart whose checkpointed offset lags past the retention window
  * fails TYPED ([[graft.SnapshotUnavailable]]) instead of silently
  * skipping promotions — the remedy is a fresh checkpoint (full
  * re-sync) and a window sized to the consumer's real lag.
  *
  * Scale shape: one pointer read per trigger; each drained promotion
  * costs its S12 diff (a full-outer join of two retained generations
  * on the keys) — proportional to the generations compared, never to
  * history length, and nothing is ever copied into a side log.
  */
class CdfSource(spark: SparkSession, root: String, keys: Seq[String],
                startGenOpt: Option[Long],
                maxGensPerTrigger: Option[Long] = None) extends Source {

  import graft.operators.Incremental

  // the diff schema is pinned at SOURCE CREATION from the serving
  // generation (the read-your-resolution contract): table columns
  // re-shaped as keys + before/after structs + change, plus the
  // generation stamp consumers key idempotence on
  override val schema: StructType = CdfSource.schemaFor(spark, root,
    keys)

  private def genOf(o: Offset): Long = o.json.toLong

  // the newest generation a PLANNED batch ended at — written by
  // getBatch, which the engine calls on restart for the recovered
  // range before any new offset is requested (the FileStreamSource
  // recovery pattern), so the admission cap below never regresses
  // the offset log
  @volatile private var lastPlannedEnd: Option[Long] = None

  override def getOffset: Option[Offset] = {
    // one pointer read; when this equals the checkpointed offset the
    // engine plans no batch (an explicit startGen at-or-past the
    // serving gen therefore idles until the next promotion)
    val cur = ChangeFeed.currentGen(spark, root)
    maxGensPerTrigger match {
      case None => Some(CdfSource.GenOffset(cur))
      case Some(mx) =>
        val base = lastPlannedEnd.getOrElse(startGenOpt.getOrElse(
          ChangeFeed.oldestRetained(spark, root, cur) - 1L))
        val capped = math.max(base, math.min(cur, base + mx))
        if (capped < cur)
          System.err.println(s"[graft-cdf] $root: admission control " +
            s"capped this trigger at generation $capped " +
            s"(${cur - capped} promotions still pending)")
        Some(CdfSource.GenOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset)
      : DataFrame = {
    val endGen = genOf(end)
    val fromGen = start.map(genOf).getOrElse(
      startGenOpt.getOrElse(
        ChangeFeed.oldestRetained(spark, root, endGen) - 1L))
    // full-sync bootstrap applies only on FIRST contact (no
    // checkpointed offset, no explicit startGen): the oldest retained
    // generation has no retained predecessor to diff against, so it
    // is delivered whole as `added` rows. A CHECKPOINTED consumer
    // whose next gen's predecessor aged out instead gets changesAt's
    // typed lag refusal — silently substituting a full sync would
    // hide dropped promotions.
    val bootstrapGen: Option[Long] =
      if (start.isEmpty && startGenOpt.isEmpty) Some(fromGen + 1L)
      else None
    val parts = ((fromGen + 1L) to endGen).map { g =>
      val diff =
        if (bootstrapGen.contains(g)) {
          val to = ChangeFeed.readAt(spark, root, g)
          Incremental.snapshotDiff(to.limit(0), to, keys)
            .filter(col("change") =!= "unchanged")
        } else ChangeFeed.changesAt(spark, root, g, keys)
      diff.withColumn("graft_gen", lit(g))
    }
    val out = parts.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    lastPlannedEnd = Some(endGen)
    org.apache.spark.sql.GraftSqlBridge.asStreamingBatch(
      out.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  override def stop(): Unit = ()
}

object CdfSource {

  /** Generation-number offset: `json` is the decimal gen, so the
    * checkpoint log is human-readable and `deserializeOffset`'s
    * default SerializedOffset round-trips through `json.toLong`.
    */
  final case class GenOffset(gen: Long) extends Offset {
    override val json: String = gen.toString
  }

  private[streaming] def schemaFor(spark: SparkSession, root: String,
                                   keys: Seq[String]): StructType = {
    val cur = ChangeFeed.currentGen(spark, root)
    val t0 = ChangeFeed.readAt(spark, root, cur).limit(0)
    val diff = graft.operators.Incremental.snapshotDiff(t0, t0, keys)
    StructType(diff.schema.fields :+
      StructField("graft_gen", LongType, nullable = false))
  }
}

/** `readStream.format("graft-cdf")` registration. */
class CdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def parse(parameters: Map[String, String])
      : (String, Seq[String], Option[Long], Option[Long]) = {
    // `path` (a table root, or `.load("cat.ns.t")`) or `table` (a
    // catalog/view identifier) — identifiers resolve to their graft
    // root through the same analysis the SQL DML router uses
    val raw = parameters.get("path")
      .orElse(parameters.get("table"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-cdf needs a path option (the table root) or a table " +
          "option (a catalog/view identifier)"))
    val root = graft.sources.GraftSqlDml.resolveTableOrPath(
      SparkSession.active, raw)
    val keys = parameters.getOrElse("keys",
      throw new IllegalArgumentException(
        "graft-cdf needs a keys option (comma-separated diff keys)"))
      .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(keys.nonEmpty, "graft-cdf: keys must name at least one column")
    val startGen = parameters.get("startGen").map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startGen must be a generation number, got '$v'")))
    val maxGens = parameters.get("maxGensPerTrigger").map { v =>
      val n = v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"maxGensPerTrigger must be a positive number, got '$v'"))
      require(n > 0,
        s"maxGensPerTrigger must be a positive number, got $n")
      n
    }
    (root, keys, startGen, maxGens)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val (root, keys, _, _) = parse(parameters)
    (shortName(),
      CdfSource.schemaFor(sqlContext.sparkSession, root, keys))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val (root, keys, startGen, maxGens) = parse(parameters)
    new CdfSource(sqlContext.sparkSession, root, keys, startGen,
      maxGens)
  }
}
