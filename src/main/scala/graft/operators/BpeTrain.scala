package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T11 — distributed BPE merge training (SURVEY.md §2.8): learn the
  * byte-pair-encoding merge table from the corpus itself — the step
  * that turns the [[graft.functions.TextFunctions.vocabulary]]
  * frequency table into an actual trained tokenizer artifact
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units").
  *
  * The classical formulation is already distribution-friendly and this
  * module keeps its shape: ONE corpus scan builds the distinct-WORD
  * frequency table (pre-tokenized with the same
  * [[graft.functions.TextFunctions.bpeTokens]] splitter every other
  * text operator uses), and every merge round after that runs on the
  * word table only — O(|vocab|) rows, corpus-size-independent. Per
  * round: one pair-count aggregation (map-side combinable, carries
  * O(distinct pairs) through the shuffle), one bounded `limit(1)`
  * argmax pulled to the driver (a scalar decision, the same pattern as
  * `kmeansIterate`'s movement check), and one merge-application
  * projection. Lineage is cut per round
  * ([[graft.Checkpoints.truncate]] — reliable checkpoint when the
  * session has a checkpoint dir).
  *
  * Merge semantics are the canonical greedy single pass: within each
  * word, all non-overlapping (left, right) adjacencies merge
  * left-to-right — in a run of equal symbols (left == right) that
  * means positions 0, 2, 4… of the run. Tie-breaks on equal pair
  * counts go to the lexicographically smallest (left, right), so the
  * learned table is deterministic across runs, partitionings and
  * engines — the DuckDB gate re-derives every round (pair counts,
  * argmax, and a positional islands re-statement of the greedy pass)
  * and must land on the identical merge table.
  */
object BpeTrain {

  /** The greedy non-overlapping merge of one round, as a fold over the
    * symbol array: append each symbol, except that a symbol equal to
    * `right` whose accumulated predecessor is `left` replaces it with
    * the merged symbol. A merged symbol can never re-trigger the rule
    * (it is strictly longer than `left`), which is exactly the
    * non-overlap guarantee.
    */
  private def applyMerge(syms: Column, left: String, right: String): Column = {
    val lv = lit(left); val rv = lit(right); val mv = lit(left + right)
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lv && x === rv,
          concat(slice(acc, lit(1), size(acc) - 1), array(mv)))
          .otherwise(concat(acc, array(x))))
  }

  /** Build the distinct-word frequency table with initial
    * character-level symbol sequences — the one corpus-sized step.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    graft.sources.Tables.fanOut(
        docs.select(graft.functions.TextFunctions.bpeTokens(col(textCol))
          .as("__toks")))
      .select(explode(col("__toks")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))

  /** Train `rounds` merges. Returns the merge table
    * (round, lhs, rhs, merged, pair_count) — rounds are 1-based and
    * ordered; applying the merges in round order IS the tokenizer.
    * Throws if the corpus runs out of adjacent pairs before `rounds`
    * merges exist (a caller asking for more merges than the corpus
    * supports should hear about it, not get a silently short table).
    *
    * The per-round checkpoint is the O(rounds) vs O(rounds²) choice:
    * each round's argmax is an action, and without the checkpoint it
    * would replay every earlier round's merge fold. The retained
    * checkpoint blocks are vocab-sized per round (the same bounded
    * retention `kmeansIterate` accepts for its centroid tables); a
    * 32k-merge production run should additionally release rounds
    * beyond a sliding window.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = graft.Checkpoints.truncate(wordTable(docs, textCol))
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // the argmax is a bounded driver scalar (one row), like the
      // kmeans movement check — never a data pull
      val top = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty)
        throw new IllegalStateException(
          s"corpus exhausted after ${r - 1} merges; asked for $rounds")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((r, a, b, a + b, cnt))
      words = graft.Checkpoints.truncate(
        words.withColumn("syms", applyMerge(col("syms"), a, b)))
    }
    merges.result().toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode text with a TRAINED merge table: pre-tokenize, split to
    * characters, and apply each merge in round order — the
    * learn→serve loop closed (the training-side twin keeps the fold;
    * a production encoder with a 32k merge table would compile the
    * merges into a trie/ranked-pair encoder instead of 32k passes,
    * but the semantics are pinned HERE). Returns (…input columns…,
    * pieces array<string>).
    */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    df.withColumn("pieces",
      flatten(transform(
        graft.functions.TextFunctions.bpeTokens(col(textCol)),
        w => merges.foldLeft(
          transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
        ) { case (acc, (a, b)) => applyMerge(acc, a, b) })))

  /** [[encode]]'s corpus-scale twin: encode each DISTINCT word once
    * and join the results back — BPE encoding is word-local, so the
    * merge folds run O(|vocab|) times instead of once per token
    * occurrence (on a crawl corpus that is orders of magnitude less
    * work; the join broadcasts or shuffles on the word, both fine).
    * Spec-pinned value-identical to [[encode]]. Output:
    * (id, pieces array<string>); documents with zero pre-tokens emit
    * nothing (they have no pieces to carry).
    */
  def encodeByVocab(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val vocab = merges.foldLeft(wordTable(df, textCol)) {
      case (acc, (a, b)) =>
        acc.withColumn("syms", applyMerge(col("syms"), a, b))
    }.select(col("word"), col("syms"))
    graft.sources.Tables.fanOut(
        df.select(col(idCol),
          graft.functions.TextFunctions.bpeTokens(col(textCol))
            .as("__toks")))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "word")))
      .join(vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("syms"))))
        .as("__ps"))
      .select(col(idCol),
        flatten(transform(col("__ps"), p => p.getField("syms")))
          .as("pieces"))
  }
}
