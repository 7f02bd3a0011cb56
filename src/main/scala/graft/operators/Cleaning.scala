package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}

/** Silver-layer cleaning operators.
  *
  * Reference behavior: src/etl/utils/data_cleaning.py —
  * `remove_null_values` (:3), `remove_whitespace` (:26),
  * `drop_duplicates` (:42), `remove_columns` (:55); plus
  * bronze_to_silver.py:47 multi-format date parsing and :176 column
  * renaming.
  *
  * Spark-first redesign, NOT a port: the reference runs a `count()`
  * action per column before deciding to clean it — at 100 TB that is
  * one full scan per column (25+ scans for the ibge table). Here each
  * cleaner builds ONE declarative filter/projection; Catalyst fuses the
  * whole chain into a single WholeStageCodegen pass over the scan, and
  * audit counts (if wanted) come from the [[Profiling]] single-pass
  * profile instead.
  */
object Cleaning {

  /** Drop every row containing a null in any column — or NaN in any
    * float/double column (reference: data_cleaning.py:3, which treats
    * numeric NaN as null). One conjunctive filter, single scan.
    */
  def removeNullRows(df: DataFrame): DataFrame = {
    val conds: Seq[Column] = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          col(f.name).isNotNull && !isnan(col(f.name))
        case _ => col(f.name).isNotNull
      }
    }
    if (conds.isEmpty) df else df.filter(conds.reduce(_ && _))
  }

  /** Trim leading/trailing whitespace in every string column
    * (reference: data_cleaning.py:26). One projection.
    */
  def trimStrings(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case StringType => trim(col(f.name)).as(f.name)
        case _          => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Exact duplicate removal (reference: data_cleaning.py:42).
    * With `subset` empty, whole-row dedup. Shuffles once on the dedup
    * key; AQE coalesces/splits skewed partitions at scale.
    */
  def dedupExact(df: DataFrame, subset: Seq[String] = Nil): DataFrame =
    if (subset.isEmpty) df.dropDuplicates() else df.dropDuplicates(subset)

  /** Column removal (reference: data_cleaning.py:55). */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Column-name normalization: `-`→`_` plus explicit renames
    * (reference: bronze_to_silver.py:176 renames `regiao-imediata` →
    * `regiao_imediata`). Single `toDF` — no per-column plan nodes.
    */
  def normalizeColumnNames(df: DataFrame,
                           renames: Map[String, String] = Map.empty): DataFrame = {
    val newNames = df.columns.map { c =>
      renames.getOrElse(c, c.replace('-', '_'))
    }
    df.toDF(newNames.toIndexedSeq: _*)
  }

  /** Multi-format date parsing (reference: bronze_to_silver.py:47:
    * `coalesce(to_date(c,'yyyy-MM-dd'), to_date(c,'dd/MM/yyyy'),
    * to_date(c,'MM-dd-yyyy'))`). `try_to_date` (not `to_date`) so a
    * format miss yields null instead of an ANSI runtime error —
    * Spark 4 runs ANSI-on by default.
    */
  val ReferenceDateFormats: Seq[String] =
    Seq("yyyy-MM-dd", "dd/MM/yyyy", "MM-dd-yyyy")

  /** Cheap shape regex for a PURELY NUMERIC date format (digit fields
    * and separators only): every run of pattern letters becomes `\d+`
    * — a SUPERSET of what the parser accepts for numeric fields, so
    * the gate can never reject a parseable value; a false positive
    * just falls through to the parser. Defined (None otherwise) only
    * when every letter run is a digit-producing token at digit-only
    * width — text tokens (`MMM`, `EEE`, `a`, …) and quoted literals
    * get NO gate rather than a wrong one. Gating keeps
    * `try_to_timestamp`'s miss path — an internally
    * thrown-and-swallowed DateTimeParseException per (row, format) —
    * off the hot loop: with k formats, k−1 of every row's parse
    * attempts are misses, and the exception machinery dominates the
    * scan.
    */
  private[graft] def formatShapeRegex(fmt: String): Option[String] = {
    // digit-producing pattern letters, at the widths where they stay
    // digits (M/E at 3+ are month/day NAMES; a/G/z/… are always text)
    val digitRun = "^(y+|Y+|M{1,2}|d{1,2}|D{1,3}|H{1,2}|h{1,2}|m{1,2}" +
      "|s{1,2}|S+|u+|e{1,2}|F{1,2}|k{1,2}|K{1,2}|q{1,2}|Q{1,2}|w{1,2})$"
    val runs = "[A-Za-z]+".r.findAllIn(fmt).toSeq
    def isAsciiLetter(ch: Char) =
      (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
    if (fmt.contains('\'') || !runs.forall(_.matches(digitRun))) None
    else {
      val sb = new StringBuilder("^")
      var i = 0
      while (i < fmt.length) {
        val ch = fmt.charAt(i)
        if (isAsciiLetter(ch)) {
          var j = i
          while (j < fmt.length && isAsciiLetter(fmt.charAt(j))) j += 1
          // year-family fields (y/Y/u) parse with SignStyle.EXCEEDS_PAD,
          // which admits a sign on over-width values ('+10000-01-01'),
          // so their shape allows an optional leading sign — keeping
          // the gate a strict SUPERSET of what the parser accepts
          sb.append(if ("yYu".contains(ch)) "[+-]?\\d+" else "\\d+")
          i = j
        } else {
          if ("\\^$.|?*+()[]{}".contains(ch)) sb.append('\\')
          sb.append(ch)
          i += 1
        }
      }
      Some(sb.append("$").toString)
    }
  }

  /** C10 — quantile clipping (winsorization) of a numeric column per
    * group: values outside the group's [lo, hi] interpolated quantiles
    * are clamped to them — the standard way to neutralize outliers
    * without dropping rows. Bounds come from ONE small per-group
    * aggregate joined back broadcast, so the data never shuffles and
    * never sorts: at 100 TB this is a scan + map-side hash probe (swap
    * `percentile` for `percentile_approx` there — same call shape,
    * sketch-mergeable, bounded error). The broadcast assumes
    * dimension-sized group cardinality (one bounds row per group);
    * for a high-cardinality group column drop the hint and let the
    * bounds join shuffle.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad quantiles [$lo, $hi]")
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(lo)).as("__lo"),
        percentile(col(valueCol), lit(hi)).as("__hi"))
      .withColumnRenamed(groupCol, "__g")
    // null-safe group match (groupBy emits a bounds row for the null
    // group, and a plain equi-join would silently DROP null-group
    // rows — breaking the "clips, never drops" contract); a null
    // value stays null instead of clamping to __lo (greatest/least
    // skip null arguments, which would fabricate a p-lo measurement
    // out of a missing one)
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"))
      .withColumn(s"${valueCol}_clipped",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__g", "__lo", "__hi")
  }

  def parseDateMulti(c: Column,
                     formats: Seq[String] = ReferenceDateFormats): Column =
    // when() short-circuits, so only shape-matching formats ever reach
    // the parser; a shape match with an invalid value (e.g. month 13)
    // still parses to null and falls through — identical semantics to
    // the unguarded coalesce. Formats the shape gate can't describe
    // (text months, quoted literals) parse ungated.
    coalesce(formats.map(f => formatShapeRegex(f) match {
      case Some(rx) =>
        when(c.rlike(rx), try_to_timestamp(c, lit(f)).cast("date"))
      case None => try_to_timestamp(c, lit(f)).cast("date")
    }): _*)

  /** The reference's full bronze→silver pipeline (bronze_to_silver.py:
    * date fix → null removal → trim → dedup → metadata stamp), fused
    * into one declarative chain. `processingDate` is injected (the
    * reference uses `current_date()`, which would make runs
    * non-reproducible).
    */
  /** C11 — declarative data-quality EXPECTATIONS (the dbt-test /
    * Great-Expectations contract surface): a rule list validated in
    * bulk, returning one row per rule with its violation count and a
    * pass flag — the machine-readable gate a write-audit-publish
    * step consumes before promoting a table.
    */
  sealed trait Expectation {
    def column: String
    def rule: String
    def detail: String
  }
  /** Column must hold no nulls. */
  case class ExpectNotNull(column: String) extends Expectation {
    val rule = "not_null"; val detail = ""
  }
  /** Non-null values must be distinct (violations = duplicate
    * surplus: n_nonnull − n_distinct).
    */
  case class ExpectUnique(column: String) extends Expectation {
    val rule = "unique"; val detail = ""
  }
  /** Non-null numeric values must lie in [lo, hi]. */
  case class ExpectRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    val rule = "range"; val detail = s"[$lo,$hi]"
  }
  /** Non-null values must be one of `values`. */
  case class ExpectInSet(column: String, values: Seq[String])
      extends Expectation {
    val rule = "in_set"
    val detail = values.mkString("{", ",", "}")
  }
  /** Non-null values must match `regex` (unanchored find — anchor
    * explicitly with ^…$ for full-value matches; keep to character
    * classes and anchors so any regex engine agrees).
    */
  case class ExpectMatches(column: String, regex: String)
      extends Expectation {
    val rule = "matches"; val detail = regex
  }

  /** Validate `expectations` against `df` in bulk. Output per rule:
    * (column_name, rule, detail, n_rows, n_violations, passed).
    *
    * Plan shape at scale: every row-predicate rule (not_null, range,
    * in_set, matches) becomes one conditional-count in a SINGLE
    * map-side-combinable aggregation — one scan for the whole rule
    * list, then a driver-free explode of the 1-row aggregate into
    * per-rule rows. Each `unique` rule runs its own two-phase
    * distinct branch (the [[Profiling.profile]] union shape: a wide
    * multi-count_distinct agg would Expand-multiply every row per
    * rule, the branch prunes to its own column instead). Violation
    * counts are exact integers; `passed` = zero violations.
    */
  def validateExpectations(df: DataFrame,
                           expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "validateExpectations needs rules")
    def violations(e: Expectation): Column = e match {
      case ExpectNotNull(c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
      case ExpectRange(c, lo, hi) =>
        sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
      case ExpectInSet(c, vs) =>
        sum(when(col(c).isNotNull &&
          !col(c).isin(vs: _*), 1L).otherwise(0L))
      case ExpectMatches(c, re) =>
        sum(when(col(c).isNotNull &&
          !col(c).rlike(re), 1L).otherwise(0L))
      case e: ExpectUnique =>
        throw new IllegalStateException(s"unreachable: $e")
    }
    def row(e: Expectation, n: Column, v: Column): Column =
      struct(lit(e.column).as("column_name"), lit(e.rule).as("rule"),
        lit(e.detail).as("detail"), n.as("n_rows"),
        v.as("n_violations"), (v === 0L).as("passed"))
    val (uniques, scans) =
      expectations.partition(_.isInstanceOf[ExpectUnique])
    val parts = new scala.collection.mutable.ArrayBuffer[DataFrame]
    if (scans.nonEmpty) {
      val aggs = scans.zipWithIndex.map { case (e, i) =>
        violations(e).as(s"__v$i")
      }
      parts += df
        .agg(count(lit(1)).as("__n"), aggs: _*)
        .select(explode(array(scans.zipWithIndex.map { case (e, i) =>
          row(e, col("__n"), col(s"__v$i"))
        }: _*)).as("r"))
        .select("r.*")
    }
    uniques.foreach { e =>
      val c = col(e.column)
      parts += df
        .agg(count(lit(1)).as("__n"), count(c).as("__nn"),
          count_distinct(c).as("__nd"))
        .select(row(e, col("__n"),
          col("__nn") - col("__nd")).as("r"))
        .select("r.*")
    }
    parts.reduce(_ unionAll _)
  }

  def silverPipeline(df: DataFrame, processingDate: String): DataFrame =
    dedupExact(trimStrings(removeNullRows(df)))
      .withColumn("_processing_date", lit(processingDate).cast("date"))
}
