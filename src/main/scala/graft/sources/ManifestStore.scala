package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** S20 — MANIFEST TABLE: the snapshot table ([[SnapshotStore]])
  * restated with FILE-LEVEL REUSE between generations — the Iceberg
  * trick, on the repo's own marker protocol. [[SnapshotStore]] writes
  * every generation as a complete physical copy, which is the right
  * cost for a bounded dimension but the wrong one for a large fact:
  * a daily promotion that changes one partition pays an O(table)
  * write, and `keep = N` retains N full copies. Here a generation is
  * a MANIFEST — a small text file listing, per partition value, the
  * immutable data files that make up the table — so:
  *
  *  - a partition-scoped promotion WRITES only the changed
  *    partitions' files; every untouched partition's entry is carried
  *    from the prior manifest byte-for-byte, and its files are never
  *    rewritten, moved, or re-read (the reference's own fact load is
  *    append-by-partition — bigquery.py:141's WRITE_APPEND — and
  *    never rewrites history);
  *  - `keep = N` retains N manifests plus the DELTA files between
  *    them, not N table copies: retention prunes exactly the files no
  *    surviving manifest references;
  *  - OPTIMIZE can rewrite only the small-file partitions
  *    ([[compactSmallPartitions]]), leaving well-laid-out partitions'
  *    files untouched.
  *
  * Layout under `root` (all underscore-prefixed — a naive parquet
  * read of the root sees nothing; readers resolve the pointer):
  *
  *  - `_writes/<gen>/graft_p=<value>/part-*.parquet` — each publish's
  *    own immutable write directory holding ONLY the partitions that
  *    publish rewrote. `graft_p` is a string COPY of the partition
  *    column made at write time, so the real column stays in the data
  *    files and a manifest read never depends on directory-name
  *    inference.
  *  - `_manifests/<gen>` — the generation: a header (partition
  *    column, schema DDL) plus one `(value, relative file path)` line
  *    per data file, possibly spanning MANY write directories.
  *  - `_current` — the serving pointer (`gen=`/`keep=` lines),
  *    committed via the [[MetaSwap]] CAS exactly like
  *    [[SnapshotStore]]'s: racing promotions fail loudly
  *    (single-logical-promoter), readers never see a gap.
  *
  * Crash honesty (the [[SnapshotStore]] contract, file-granular): a
  * publish stages its write directory, audits the staged bytes
  * (C11, blocking), writes the manifest, and only then repoints — a
  * crash anywhere before the repoint leaves residue nothing points
  * at (the retried publish allocates the same gen and overwrites it;
  * retention sweeps unreferenced files). A failed audit leaves the
  * staged files for inspection and throws the typed
  * [[graft.AuditFailed]] with the serving manifest untouched.
  *
  * Scale shape: the publish write is O(changed partitions); the
  * manifest is metadata (one line per file — bounded by file count,
  * which [[compactSmallPartitions]] bounds); the repoint is one
  * small-file swap; retention is listings + verified deletes of the
  * delta. Reads are EXPLICIT-path parquet scans of the manifest's
  * files — partition pruning ([[readPartitions]]) is structural
  * (driver filters the entry list), not optimizer-dependent, the
  * same discipline as the corpus gold's shard reads
  * (Pipeline.scala) and the vector index's probed `cell=` dirs.
  */
object ManifestStore {

  /** The staged partition-directory prefix. Deliberately NOT
    * underscore-prefixed: Spark's listing hides `_`/`.` directories,
    * and the staged AUDIT reads the write directory as a normal
    * partitioned table.
    */
  private[graft] val PartDirPrefix = "graft_p="

  /** One data file of one partition. `partition` is the RAW value
    * string (directory-name escaping already undone); `relPath` is
    * the file's path relative to the table root — immutable once a
    * manifest names it.
    */
  final case class ManifestEntry(partition: String, relPath: String)

  /** A generation: the partition column, the data schema (DDL — what
    * makes a zero-entry manifest servable), the file list, and the
    * publish instant (0 on a pre-grace manifest — treated as
    * grace-expired, the pre-r14 prune behavior).
    */
  final case class Manifest(partCol: String, schemaDdl: String,
                            entries: Seq[ManifestEntry],
                            publishedMs: Long = 0L)

  private def pointer(root: String) = new Path(s"$root/_current")
  private def manifestPath(root: String, gen: Long) =
    new Path(s"$root/_manifests/$gen")
  private def writesDir(root: String, gen: Long) =
    s"$root/_writes/$gen"

  /** The committed generation the pointer serves, if the table has
    * ever been published (self-heals a crashed swap first).
    */
  def currentGen(spark: SparkSession, root: String): Option[Long] = {
    val fs = Tables.fsFor(spark, root)
    val p = pointer(root)
    MetaSwap.heal(fs, p)
    if (!fs.exists(p)) None
    else SnapshotStore.parsedGen(MetaSwap.readCommitted(fs, p))
      .orElse(throw new IllegalStateException(
        "malformed manifest-table pointer: no parseable gen= line"))
  }

  // ---- manifest (de)serialization --------------------------------
  // One header line per field, then one tab-separated line per file.
  // The partition VALUE is URL-encoded so a value containing tabs or
  // newlines cannot corrupt the line format; relPaths are the
  // writer's own `gen/graft_p=…/part-….parquet` names (path-safe by
  // construction).

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")

  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

  private[graft] def serializeManifest(m: Manifest): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("partcol=").append(m.partCol).append('\n')
    sb.append("schema=").append(m.schemaDdl).append('\n')
    sb.append("published=").append(m.publishedMs).append('\n')
    m.entries.foreach { e =>
      sb.append(enc(e.partition)).append('\t').append(e.relPath)
        .append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }

  private[graft] def parseManifest(bytes: Array[Byte]): Manifest = {
    val lines = new String(bytes, "UTF-8").linesIterator.toSeq
    def header(key: String): String = lines
      .collectFirst { case s if s.startsWith(s"$key=") =>
        s.stripPrefix(s"$key=") }
      .getOrElse(throw new IllegalStateException(
        s"malformed manifest: no $key= header"))
    val entries = lines.filter(_.contains('\t')).map { l =>
      val i = l.indexOf('\t')
      ManifestEntry(dec(l.take(i)), l.drop(i + 1))
    }
    // `published=` is optional: a pre-grace manifest parses with 0
    // (grace-expired), so old tables keep their exact prune behavior
    val published = lines.collectFirst {
      case s if s.startsWith("published=") =>
        s.stripPrefix("published=").trim
    }.flatMap(_.toLongOption).getOrElse(0L)
    Manifest(header("partcol"), header("schema"), entries, published)
  }

  /** Generation `gen`'s manifest. Refuses with the typed
    * [[graft.SnapshotUnavailable]] when `gen` never committed (a
    * crashed publish's manifest residue is NOT readable) or aged past
    * the retention window — [[SnapshotStore.readAt]]'s contract.
    */
  def manifestAt(spark: SparkSession, root: String,
                 gen: Long): Manifest = {
    val cur = currentGen(spark, root).getOrElse(
      throw new graft.SnapshotUnavailable(
        s"no published manifest table at $root"))
    if (gen > cur) throw new graft.SnapshotUnavailable(
      s"generation $gen of $root never committed (current is $cur) — " +
        "a crashed publish's manifest residue is not a snapshot")
    val fs = Tables.fsFor(spark, root)
    val p = manifestPath(root, gen)
    if (!fs.exists(p)) throw new graft.SnapshotUnavailable(
      s"generation $gen of $root aged past the retention window " +
        "(keep) — snapshots are a bounded window by design")
    parseManifest(MetaSwap.readCommitted(fs, p))
  }

  /** Schema posture across generations (the S14 discipline on the
    * file-reuse layout): a partial publish may carry a WIDER or
    * REORDERED schema than the files it reuses — the manifest records
    * the publishing df's DDL and the read pins it, so parquet's
    * by-name resolution null-fills added columns in older files and
    * ignores dropped ones. A TYPE change of an existing column needs
    * a `replaceAll` rebuild, exactly like any parquet table.
    */
  private def readEntries(spark: SparkSession, root: String,
                          m: Manifest,
                          entries: Seq[ManifestEntry]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(m.schemaDdl)
    if (entries.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else
      // explicit FILE paths: each file's parent is its own base path,
      // so no directory-name partition inference runs (the partition
      // column is IN the data); the declared schema pins column order
      // across write directories from different publishes
      spark.read.schema(schema)
        .parquet(entries.map(e => s"$root/${e.relPath}"): _*)
  }

  /** The serving view: resolve the pointer once, read that immutable
    * manifest's files. Concurrent publishes never disturb this read.
    */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val gen = currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root — nothing has been " +
          "promoted yet (ManifestStore.publish)"))
    readAt(spark, root, gen)
  }

  /** Time travel: the table exactly as generation `gen` served it —
    * answerable because data files are immutable and retention keeps
    * every file some surviving manifest references.
    */
  def readAt(spark: SparkSession, root: String, gen: Long): DataFrame = {
    val m = manifestAt(spark, root, gen)
    readEntries(spark, root, m, m.entries)
  }

  /** STRUCTURAL partition pruning: read only `values`' partitions of
    * generation `gen` (default: the serving generation) — the driver
    * filters the manifest's entry list and the scan opens exactly
    * those files; nothing else is listed or read. A null partition
    * value is addressed by the hive default-partition sentinel.
    */
  def readPartitions(spark: SparkSession, root: String,
                     values: Seq[String],
                     gen: Option[Long] = None): DataFrame = {
    val g = gen.orElse(currentGen(spark, root)).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root"))
    val m = manifestAt(spark, root, g)
    val want = values.map(nullSafe).toSet
    readEntries(spark, root, m,
      m.entries.filter(e => want(e.partition)))
  }

  private def nullSafe(v: String): String =
    if (v == null)
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .DEFAULT_PARTITION_NAME
    else v

  /** Publish `df` as the next generation. `replaceAll = false` (the
    * steady-state promotion) REPLACES only the partitions `df`
    * contains rows for and CARRIES every other partition's file
    * entries from the prior manifest — those files are not rewritten,
    * moved, or read; `replaceAll = true` (bootstrap / full rebuild)
    * makes the new manifest list exactly `df`'s partitions, so a
    * partition absent from a full rebuild stops being served (the
    * corpusGold stale-shard rule). Returns the committed generation.
    *
    * `coalescePartitions = true` (default) shuffles once on the
    * partition value so each partition lands as ONE file per publish
    * — the layout a manifest table wants (entries stay bounded).
    * Disable it for a promotion whose single partition is too large
    * for one task, pre-repartitioning upstream instead.
    *
    * `keep` is the retention window in generations (current counts
    * as one): older manifests are pruned, then every file no
    * surviving manifest references is deleted — so retention holds
    * deltas, never `keep` full copies. `retainMs` is the WALL-CLOCK
    * grace floor beside it ([[SnapshotStore.publish]]'s r14 reader
    * contract): a superseded manifest also survives until at least
    * that many ms after its publish instant (recorded in the
    * manifest's own `published=` header), and while it survives,
    * every file it references survives with it.
    */
  def publish(spark: SparkSession, df: DataFrame, root: String,
              partCol: String,
              expectations: Seq[graft.operators.Cleaning.Expectation] =
                Nil,
              keep: Int = 3, replaceAll: Boolean = false,
              coalescePartitions: Boolean = true,
              retainMs: Long = 0L): Long =
    publishImpl(spark, df, root, partCol, expectations, keep,
      replaceAll, coalescePartitions, () => (), retainMs)

  /** [[publish]] with a crash-injection hook fired between the staged
    * write+audit+manifest and the pointer swap — the
    * [[SnapshotStore.publishImpl]] pattern, so the no-serving-gap and
    * residue-refusal contracts are TESTED, not asserted.
    */
  private[graft] def publishImpl(spark: SparkSession, df: DataFrame,
                                 root: String, partCol: String,
                                 expectations: Seq[graft.operators.Cleaning.Expectation],
                                 keep: Int, replaceAll: Boolean,
                                 coalescePartitions: Boolean,
                                 beforeRepoint: () => Unit,
                                 retainMs: Long = 0L): Long = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    require(retainMs >= 0, s"retainMs must be >= 0, got $retainMs")
    require(df.columns.contains(partCol),
      s"partition column $partCol not in ${df.columns.mkString(",")}")
    require(!df.columns.contains("graft_p"),
      "column name graft_p is reserved for the staged layout")
    val fs = Tables.fsFor(spark, root)
    val p = pointer(root)
    MetaSwap.heal(fs, p)
    val prior =
      if (fs.exists(p)) Some(MetaSwap.readCommitted(fs, p)) else None
    val priorGen = prior.map(b => SnapshotStore.parsedGen(b).getOrElse(
      throw new IllegalStateException(
        "malformed manifest-table pointer: no parseable gen= line")))
    val priorManifest = priorGen.map(g =>
      parseManifest(MetaSwap.readCommitted(fs, manifestPath(root, g))))
    priorManifest.foreach(pm => require(pm.partCol == partCol,
      s"partition column mismatch: table is partitioned by " +
        s"${pm.partCol}, publish got $partCol"))
    val gen = priorGen.getOrElse(0L) + 1L
    val stagingDir = writesDir(root, gen)
    // mode=overwrite consumes the one possible residue here: a prior
    // publish of THIS gen that crashed (or failed its audit) before
    // the repoint — nothing ever pointed at it
    val staged0 = df.withColumn("graft_p", col(partCol).cast("string"))
    val staged = if (coalescePartitions)
      staged0.repartition(col("graft_p")) else staged0
    staged.write.mode("overwrite").partitionBy("graft_p")
      .parquet(stagingDir)
    if (expectations.nonEmpty) {
      Tables.auditStaged(spark, stagingDir, expectations)
      ()
    }
    // staged entries from the write directory's own listing — the
    // dir-name escaping undone once here, so the manifest holds RAW
    // partition values and nothing downstream ever re-encodes
    val stagedEntries = fs.listStatus(new Path(stagingDir)).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(PartDirPrefix))
      .sortBy(_.getPath.getName)
      .flatMap { dir =>
        val value = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(
            dir.getPath.getName.stripPrefix(PartDirPrefix))
        fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile &&
            f.getPath.getName.endsWith(".parquet") &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map(f => ManifestEntry(value,
            s"_writes/$gen/${dir.getPath.getName}/${f.getPath.getName}"))
      }
    val stagedValues = stagedEntries.map(_.partition).toSet
    val entries =
      if (replaceAll || priorManifest.isEmpty) stagedEntries
      else priorManifest.get.entries
        .filterNot(e => stagedValues(e.partition)) ++ stagedEntries
    val schemaDdl = df.drop("graft_p").schema.toDDL
    val manifest = Manifest(partCol, schemaDdl, entries,
      System.currentTimeMillis())
    // the manifest commits through the same self-healing swap as the
    // pointer (stage `.next`, rename in): a reader healing a crashed
    // publish can never observe a half-written file list
    MetaSwap.swap(fs, manifestPath(root, gen),
      serializeManifest(manifest))
    beforeRepoint()
    val bytes = s"gen=$gen\nkeep=$keep\ngrace=$retainMs\n"
      .getBytes("UTF-8")
    prior match {
      case Some(expect) => MetaSwap.swap(fs, p, bytes, expect)
      case None         => MetaSwap.swap(fs, p, bytes)
    }
    // retention AFTER the repoint: a crash anywhere above leaves
    // residue nothing points at, never a gap
    prune(fs, root, gen, keep, retainMs)
    gen
  }

  /** Retention: drop manifests older than the window, then every
    * data file NO surviving manifest references — this is what makes
    * `keep = N` hold deltas instead of N table copies, and it also
    * sweeps crashed-publish residue (files nothing ever pointed at).
    * Verified deletes throughout (the protocol-wide discipline).
    */
  private def prune(fs: org.apache.hadoop.fs.FileSystem, root: String,
                    gen: Long, keep: Int, retainMs: Long): Unit = {
    val mBase = new Path(s"$root/_manifests")
    if (!fs.exists(mBase)) return
    val allGens = fs.listStatus(mBase).toSeq
      .filterNot(_.getPath.getName.endsWith(".next"))
      .flatMap(_.getPath.getName.toLongOption)
    def verifiedDelete(p: Path, what: String): Unit =
      if (!fs.delete(p, true)) throw new IllegalStateException(
        s"cannot prune $what ${p} — the pointer has moved (the " +
          "publish IS committed); remove it manually or let the " +
          "next publish retry")
    val now = System.currentTimeMillis()
    def inGrace(g: Long): Boolean = retainMs > 0 &&
      now - parseManifest(MetaSwap.readCommitted(fs,
        manifestPath(root, g))).publishedMs < retainMs
    // the kept set is decided FIRST (generation window OR wall-clock
    // grace), and the file sweep is railed on exactly that set — a
    // grace-retained manifest keeps every file it references, so it
    // stays SERVABLE for the whole floor, not just present
    val (kept, doomedGens) = allGens.partition(g =>
      g > gen - keep || (g <= gen && inGrace(g)))
    doomedGens.foreach(g =>
      verifiedDelete(manifestPath(root, g), "superseded manifest"))
    val referenced = kept.filter(_ <= gen)
      .flatMap(g => parseManifest(
        MetaSwap.readCommitted(fs, manifestPath(root, g)))
        .entries.map(_.relPath))
      .toSet
    val wBase = new Path(s"$root/_writes")
    if (!fs.exists(wBase)) return
    fs.listStatus(wBase).foreach { wd =>
      wd.getPath.getName.toLongOption.foreach { g =>
        var kept = false
        val it = fs.listFiles(wd.getPath, true)
        val doomed = scala.collection.mutable.ArrayBuffer[Path]()
        while (it.hasNext) {
          val f = it.next()
          val rel = s"_writes/$g/" + f.getPath.toString
            .split(s"/_writes/$g/", 2).last
          val hidden = f.getPath.getName.startsWith("_") ||
            f.getPath.getName.startsWith(".")
          if (referenced(rel)) kept = true
          else if (!hidden) doomed += f.getPath
        }
        if (!kept)
          // no surviving manifest references this publish at all:
          // reclaim the whole write directory (markers included)
          verifiedDelete(wd.getPath, "unreferenced write directory")
        else if (doomed.nonEmpty) {
          doomed.foreach(verifiedDelete(_, "unreferenced file"))
          // partition dirs left empty by the file sweep go too — a
          // stale `graft_p=` husk would read as a live partition to
          // anyone listing the pool
          fs.listStatus(wd.getPath)
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith(PartDirPrefix) &&
              fs.listStatus(st.getPath).isEmpty)
            .foreach(st =>
              verifiedDelete(st.getPath, "emptied partition dir"))
        }
      }
    }
  }

  /** Partition-scoped MERGE (S17 restated on the manifest table):
    * upsert `batch` by `keys` into only the partitions the batch
    * touches — existing rows in those partitions survive unless a
    * batch row carries their key; every OTHER partition's files are
    * untouched on disk. The affected-partition list is a bounded
    * driver scalar (≤ the table's partition count); the read side is
    * [[readPartitions]]' structural pruning, so the daily cost is
    * O(touched partitions), never O(table).
    *
    * Preconditions (the S17 contract): the partition key is stable
    * under updates for a given row key, and merge `keys` are
    * non-null — SQL null-semantics make a null key unmatchable by
    * the anti-join, so a null-keyed existing row would survive
    * alongside its null-keyed replacement; gate such rows out
    * upstream (C1) or via `expectations`.
    */
  def mergePartitions(spark: SparkSession, batch: DataFrame,
                      root: String, keys: Seq[String],
                      expectations: Seq[graft.operators.Cleaning.Expectation] =
                        Nil,
                      keep: Int = 3): Long = {
    val gen = currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root — bootstrap with " +
          "ManifestStore.publish first"))
    val m = manifestAt(spark, root, gen)
    val partCol = m.partCol
    val affected = batch
      .select(col(partCol).cast("string")).distinct()
      .collect().map(r => nullSafe(r.getString(0))).toSeq
    // an empty batch touches nothing: no staged write, no new
    // generation (the corpusGold no-shard-touched discipline)
    if (affected.isEmpty) return gen
    val existing = readPartitions(spark, root, affected, Some(gen))
    val merged = batch.unionByName(
      existing.join(batch.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))
    publish(spark, merged, root, partCol, expectations, keep)
  }

  /** Zero-downtime OPTIMIZE, file-level: rewrite ONLY the partitions
    * whose current layout has more files than
    * `ceil(bytes / targetBytesPerFile)` — well-laid-out partitions'
    * files ride into the new generation untouched. Sizing is pure
    * metadata (one stat per manifest entry); the rewrite reads and
    * writes only the offending partitions. Returns the number of
    * partitions rewritten (0 = nothing to do, no new generation).
    */
  def compactSmallPartitions(spark: SparkSession, root: String,
                             targetBytesPerFile: Long,
                             keep: Int = 3): Int = {
    require(targetBytesPerFile > 0)
    // maintenance PREFLIGHT (the compaction-entry discipline every
    // persisted store carries): an unhealthy table — a manifest
    // naming a missing file, a damaged pointer — refuses TYPED
    // before any sizing or rewrite, naming the finding and the
    // remedy surface, rather than baking a partial table into a
    // fresh generation or crashing mid-rewrite on the damage the
    // fsck exists to diagnose
    graft.operators.IndexAudit.auditManifestTable(spark, root)
      .find(!_.healthy)
      .foreach(f => throw new graft.IndexUnhealthy(
        s"manifest table at $root is unhealthy " +
          s"(${f.kind}/${f.name}: ${f.status}) — compaction would " +
          "republish damaged state; run IndexAudit.auditManifestTable " +
          "for the full report and repairManifestTable / restore the " +
          "named file, then retry"))
    val gen = currentGen(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no published manifest table at $root"))
    val m = manifestAt(spark, root, gen)
    val fs = Tables.fsFor(spark, root)
    val byPart = m.entries.groupBy(_.partition)
    val offenders = byPart.filter { case (_, es) =>
      val bytes = es.map(e =>
        fs.getFileStatus(new Path(s"$root/${e.relPath}")).getLen).sum
      val want = math.max(1L,
        (bytes + targetBytesPerFile - 1) / targetBytesPerFile)
      es.size > want
    }.keys.toSeq.sorted
    if (offenders.isEmpty) 0
    else {
      // each offender re-splits to its own target file count: a tiny
      // (partition → want) table broadcast onto the rows, a salt in
      // [0, want), and a shuffle keyed (partition, salt) so each
      // partition lands in ≈want tasks → ≈want files
      import org.apache.spark.sql.functions.{broadcast, lit,
        monotonically_increasing_id, pmod}
      import spark.implicits._
      val want = offenders.map { p =>
        val es = byPart(p)
        val bytes = es.map(e =>
          fs.getFileStatus(new Path(s"$root/${e.relPath}")).getLen).sum
        (p, math.max(1L,
          (bytes + targetBytesPerFile - 1) / targetBytesPerFile))
      }.toDF("__pv", "__want")
      val rows = readPartitions(spark, root, offenders, Some(gen))
      val resized = rows
        // null partition rows must join their sentinel-keyed want row
        .withColumn("__pv", org.apache.spark.sql.functions.coalesce(
          col(m.partCol).cast("string"),
          lit(org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.DEFAULT_PARTITION_NAME)))
        .join(broadcast(want), Seq("__pv"))
        .withColumn("__salt",
          pmod(monotonically_increasing_id(), col("__want")))
        .repartition(col("__pv"), col("__salt"))
        .drop("__pv", "__want", "__salt")
      publish(spark, resized, root, m.partCol, Nil, keep,
        coalescePartitions = false)
      offenders.size
    }
  }
}
