package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines:
  * tokenization, language ID, quality scoring.
  *
  * These extend the engine beyond the reference's surface (the
  * reference cleans strings but never analyzes text;
  * SURVEY.md §2.8) — they are what a 100 TB documents pipeline
  * filters and routes on.
  *
  * Everything here is built from codegen'd `functions._` expressions —
  * no UDFs — so the whole per-document computation stays inside one
  * WholeStageCodegen stage over the scan: the per-row cost is pure CPU
  * with zero (de)serialization, and Catalyst can still push down,
  * prune, and fuse around it.
  *
  * Determinism: ratios are plain double expression trees with explicit
  * parenthesization (same value on any engine/cluster), rounded at the
  * output boundary.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed string. Scanner kernel
    * ([[graft.plans.WsTokenize]]) with exact value parity to the
    * previous `split(trim(c), "\\s+")` form — same elements, same
    * leading/trailing-empty semantics — at a fraction of the regex
    * cost (no Pattern/Matcher machinery, no String copy per row).
    */
  def tokens(c: Column): Column = graft.plans.TokenizeApi.ws_tokenize(c)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: alpha runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenizer split most BPE vocab
    * builds start from. (Regex kept to a dialect Java and RE2 agree
    * on.)
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** The BPE-ish token ARRAY itself — for consumers that slice the
    * token stream (e.g. [[graft.operators.Corpus.packTokenStream]]),
    * not just count it. Materialize it once per row before slicing
    * (see the lambda-recompute warning on
    * [[graft.operators.Dedup.shinglesFromTokens]]).
    */
  def bpeTokens(c: Column): Column =
    graft.plans.TokenizeApi.bpe_tokenize(c) // scanner twin of
  // `regexp_extract_all(c, BpePattern, 0)` — value-identical match
  // stream (see graft.plans.Tokenize.bpeTokenize's parity contract)
  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Kept for differential parity specs: the regex twin the scanner
    * kernels are value-checked against (TokenizeParitySpec).
    */
  private[graft] def regexExtractAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))

  /** Count of tokens that appear in `words` — a native codegen
    * expression (hash-set probe per token inside WholeStageCodegen),
    * value-identical to the earlier interpreted
    * `size(filter(tokens, array_contains))` HOF form.
    */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    graft.plans.CountInSet.count_in_set(tokens(c), words)

  /** Tiny per-language stopword tables for the heuristic language ID.
    * (Shared function words; overlaps like es/fr "de"/"la" are fine —
    * the argmax with a fixed tie order decides.)
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "del"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "de", "et", "est", "en", "les", "des"))

  /** Heuristic language ID: CJK characters short-circuit to "zh";
    * otherwise argmax of per-language stopword hits with fixed
    * tie-break order en > es > de > fr. One expression, no UDF.
    */
  def langId(c: Column): Column = {
    val scores = Stopwords.map { case (l, ws) => l -> stopwordCount(c, ws) }
    val Seq(en, es, de, fr) = scores.map(_._2)
    val zh = graft.plans.TokenizeApi.count_cjk(c) // scanner twin of
    // size(regexp_extract_all(c, "[\\x{4e00}-\\x{9fff}]"))
    when(zh > 0, "zh")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Alphabetic-character ratio over total length (0 for empty).
    * Scanner count ([[graft.plans.CountAsciiLetters]]), value-
    * identical to `size(regexp_extract_all(c, "[A-Za-z]"))`.
    */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      graft.plans.TokenizeApi.count_ascii_letters(c).cast("double") /
        length(c))

  /** Punctuation-character ratio over total length. Scanner count
    * ([[graft.plans.CountNonAlnumWs]]), value-identical to
    * `size(regexp_extract_all(c, "[^A-Za-z0-9\\s]"))` — one match per
    * code point outside ASCII alnum/whitespace.
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      graft.plans.TokenizeApi.count_non_alnum_ws(c).cast("double") /
        length(c))

  /** Stopword-token ratio (language-agnostic union list). */
  def stopwordRatio(c: Column): Column = {
    val all = Stopwords.flatMap(_._2).distinct
    when(tokenCount(c) === 0, 0.0).otherwise(
      stopwordCount(c, all).cast("double") / tokenCount(c))
  }

  /** Mean whitespace-token length in characters. Length sum is a
    * native codegen expression (one fused loop), value-identical to
    * the earlier interpreted `aggregate(transform(...))` HOF form.
    */
  def meanTokenLen(c: Column): Column =
    when(tokenCount(c) === 0, 0.0).otherwise(
      graft.plans.SumStringLengths.sum_string_lengths(tokens(c))
        .cast("double") / tokenCount(c))

  /** Composite quality score in [0,1]: the length/punctuation/stopword
    * blend used to filter junk documents. Fixed weights; deterministic
    * expression tree.
    */
  def qualityScore(c: Column): Column =
    round(
      (stopwordRatio(c) * 0.4) +
      (alphaRatio(c) * 0.3) +
      (least(meanTokenLen(c) / 10.0, lit(1.0)) * 0.2) +
      ((lit(1.0) - punctRatio(c)) * 0.1), 6)

  /** T8 — token-budget truncation: keep the first `n` whitespace
    * tokens (the context-window prep step). Array slice + join — one
    * projection, engine-portable.
    */
  def truncateTokens(c: Column, n: Int): Column =
    array_join(slice(tokens(c), 1, n), " ")

  /** T7 — intra-document repetition signals (the Gopher-style quality
    * gates of Rae et al. 2021 §A1.1): the fraction of duplicated
    * tokens and duplicated word 3-grams inside each document. Highly
    * repetitive documents (boilerplate, generation loops, scraped
    * nav-bars) are the classic pretraining poison these flag. Pure
    * per-row array expressions — single projection, zero shuffle, and
    * any engine recomputes them exactly (integer size ratios in
    * double).
    */
  def repetitionReport(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    val prepped = graft.sources.Tables.fanOut(
      df.select(col(idCol), tokens(col(textCol)).as("__ws")))
      .withColumn("__sh",
        graft.operators.Dedup.shinglesFromTokens(col("__ws")))
    def dupFrac(arr: Column): Column =
      when(size(arr) === 0, 0.0).otherwise(
        round(lit(1.0) -
          size(array_distinct(arr)).cast("double") / size(arr), 6))
    prepped.select(col(idCol),
      size(col("__ws")).cast("bigint").as("n_tokens"),
      dupFrac(col("__ws")).as("dup_token_frac"),
      dupFrac(col("__sh")).as("dup_ngram_frac"))
  }

  /** T6 — canonical text normalization (the projection run before
    * exact/near dedup so formatting noise doesn't defeat hashing):
    * trim, collapse whitespace runs to single spaces, lowercase.
    * Unicode-aware `lower` on every engine; deliberately NO
    * locale-specific case folding or accent stripping — those change
    * content, which is silver-cleaning's decision, not a hash prep's.
    */
  def normalizeText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** T6b — boilerplate stripping for web-corpus text: HTML/XML tags,
    * URLs, and HTML entities — named (`&amp;`) and numeric character
    * references in decimal (`&#39;`) or hex (`&#x2019;`) form, both
    * common in crawled HTML — become spaces, then whitespace
    * re-collapses. The standard first pass over crawled documents
    * before any quality metric runs (markup would otherwise pollute
    * alpha/punct ratios and token counts). Chained `regexp_replace` —
    * codegen'd, patterns within the dialect Java regex and RE2 share,
    * so any engine reproduces the output byte-for-byte.
    */
  def stripMarkup(c: Column): Column = {
    val tags = regexp_replace(c, "<[^>]*>", " ")
    val urls = regexp_replace(tags, "https?://[^\\s]+", " ")
    val ents = regexp_replace(urls, "&#?[A-Za-z0-9]+;", " ")
    trim(regexp_replace(ents, "\\s+", " "))
  }

  /** PII scrubbing for training corpora: emails, phone-number shapes,
    * and long digit runs (ids/ssn-ish) replaced with typed placeholder
    * tokens. Chained `regexp_replace` — codegen'd, one pass per
    * pattern, patterns kept to the regex dialect Java and RE2 share.
    */
  def redactPII(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val phone = regexp_replace(email,
      "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{2,3}\\)?[-. ]?[0-9]{3,4}[-. ]?[0-9]{4}",
      "[PHONE]")
    regexp_replace(phone, "[0-9]{8,}", "[NUMBER]")
  }

  /** Full per-document quality report with the token array materialized
    * ONCE. The single-column functions above inline `tokens(c)` inside
    * lambda bodies, where Catalyst does no CSE — fine for one metric,
    * needlessly re-tokenizing for four. Values are identical.
    */
  def qualityReport(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    extra: Seq[(String, Column)] = Nil)
      : org.apache.spark.sql.DataFrame = {
    val allStop = Stopwords.flatMap(_._2).distinct
    val ws = col("__ws")
    // `extra` columns ride the same scan/projection (computed against
    // the input row, carried through) so composed reports — e.g.
    // Corpus.trainingFilter's token count — stay single-pass instead
    // of re-scanning and joining
    val metrics = graft.sources.Tables.fanOut(df
      .select(col(idCol) +: col(textCol).as("__t") +:
        tokens(col(textCol)).as("__ws") +:
        extra.map { case (n, c) => c.as(n) }: _*))
      .select(col(idCol) +:
        alphaRatio(col("__t")).as("alpha_ratio") +:
        punctRatio(col("__t")).as("punct_ratio") +:
        when(size(ws) === 0, 0.0).otherwise(
          graft.plans.CountInSet.count_in_set(ws, allStop)
            .cast("double") / size(ws))
          .as("stopword_ratio") +:
        when(size(ws) === 0, 0.0).otherwise(
          graft.plans.SumStringLengths.sum_string_lengths(ws)
            .cast("double") / size(ws))
          .as("mean_token_len") +:
        extra.map { case (n, _) => col(n) }: _*)
    metrics.select(col(idCol) +: col("alpha_ratio") +: col("punct_ratio") +:
      col("stopword_ratio") +: col("mean_token_len") +:
      round(
        (col("stopword_ratio") * 0.4) +
        (col("alpha_ratio") * 0.3) +
        (least(col("mean_token_len") / 10.0, lit(1.0)) * 0.2) +
        ((lit(1.0) - col("punct_ratio")) * 0.1), 6).as("quality_score") +:
      extra.map { case (n, _) => col(n) }: _*)
  }

  /** T9 — corpus VOCABULARY: the top-`topK` [[bpeTokens]] pieces by
    * total occurrence, with document frequency — the frequency table a
    * BPE/WordPiece vocabulary build starts from (and the df side of
    * any tf-idf weighting downstream).
    *
    * Output: (token, term_freq, doc_freq, vocab_rank), rank dense 1..k
    * by (term_freq desc, token asc) — a total order, so the cut at
    * `topK` is deterministic on any engine or partitioning.
    *
    * Plan shape at corpus scale: explode + one groupBy on the token —
    * partial aggregation collapses each partition to its local vocab
    * before the shuffle, so the exchange carries O(vocab) rows per
    * partition, not O(tokens). `countDistinct` for doc_freq expands to
    * the same two-phase shape (partial distinct on (token, doc) first).
    * The rank window runs AFTER the top-k cut, over k rows on one
    * task — k is vocab-sized by definition, never corpus-sized.
    */
  def vocabulary(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, topK: Int)
      : org.apache.spark.sql.DataFrame = {
    val toks = graft.sources.Tables.fanOut(
      df.select(col(idCol).as("__id"), col(textCol).as("__t")))
      .select(col("__id"), explode(bpeTokens(col("__t"))).as("token"))
    val top = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"),
        countDistinct(col("__id")).as("doc_freq"))
      .orderBy(col("term_freq").desc, col("token"))
      .limit(topK)
    top.withColumn("vocab_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("term_freq").desc, col("token"))).cast("bigint"))
  }

  /** T15 — chi-square token↔label association: the feature-selection
    * table a quality/domain classifier (T12) is built from. For each
    * token, the 2×2 document-frequency contingency against a boolean
    * label (`labelPred` over the doc row):
    * `a` = labeled docs containing the token, `b` = unlabeled docs
    * containing it, `c`/`d` the complements, and
    * `χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — the classic
    * feature-scoring statistic (Yang & Pedersen 1997).
    *
    * Exactness: every count is an exact integer (products stay well
    * under 2⁵³); the χ² value is exactly three IEEE ops — one
    * multiply, two left-associated divides — then round 6 dp, so any
    * engine computing the same shape matches bit-for-bit.
    *
    * Plan shape at corpus scale: per-doc `array_distinct` BEFORE the
    * explode (doc-frequency needs each (doc, token) once — deduping
    * inside the row costs nothing and keeps the exchange at distinct
    * pairs, the [[vocabulary]] partial-agg shape), one combinable
    * groupBy(token), corpus totals as a broadcast 1-row scalar, and
    * the rank window only over the k-row cut. Tokens in fewer than
    * `minDf` docs (no evidence) or in EVERY doc (no signal, and a
    * zero denominator) are excluded.
    */
  def chiSquareTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, labelPred: Column,
                     topK: Int = 50, minDf: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val docs = graft.sources.Tables.fanOut(
      df.select(col(idCol).as("__id"),
        when(labelPred, 1L).otherwise(0L).as("__lab"),
        col(textCol).as("__t")))
    val pairs = docs.select(col("__id"), col("__lab"),
      explode(array_distinct(tokens(col("__t")))).as("token"))
    val counts = pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df_all"), sum(col("__lab")).as("df_pos"))
    val totals = docs.agg(count(lit(1)).as("__n"),
      sum(col("__lab")).as("__p"))
    val b = col("df_all") - col("df_pos")
    val c = col("__p") - col("df_pos")
    val d = col("__n") - col("__p") - b
    val adbc = col("df_pos") * d - b * c
    val scored = counts.crossJoin(broadcast(totals))
      .filter(col("df_all") >= minDf && col("df_all") < col("__n"))
      .withColumn("chi2", round(
        col("__n").cast("double") * (adbc * adbc).cast("double")
          / (col("df_all") * (col("__n") - col("df_all"))).cast("double")
          / (col("__p") * (col("__n") - col("__p"))).cast("double"), 6))
      .select(col("token"), col("df_pos"), col("df_all"), col("chi2"))
      .orderBy(col("chi2").desc, col("token"))
      .limit(topK)
    scored.withColumn("chi2_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("chi2").desc, col("token"))).cast("bigint"))
  }
}
