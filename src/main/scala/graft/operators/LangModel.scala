package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T14 — n-gram language-model PERPLEXITY filtering (SURVEY.md §2.8):
  * the CCNet-style quality gate — train a small LM on a trusted
  * held-in slice, score every document by mean per-token negative
  * log-likelihood, keep the low-perplexity tail. The fourth member of
  * the trained-artifact family (k-means, BPE, logistic regression):
  * training is corpus-scan aggregation into a bounded model table,
  * serving is a join against that table.
  *
  * Model: bigram with add-α smoothing —
  * P(w₂|w₁) = (C(w₁,w₂) + α) / (C(w₁) + α·V), where C(w₁) is derived
  * as Σ_w₂ C(w₁,w₂) (so the conditional normalizes exactly) and V is
  * the training slice's distinct-token count. Unseen bigrams fall
  * back to α-mass; unseen left-contexts to 1/V. Tokens are the
  * corpus-wide [[graft.functions.TextFunctions.BpePattern]] stream
  * over lowercased text — the same convention as BM25/BPE, so one
  * tokenize discipline covers every text operator.
  *
  * Cross-engine exactness (the BM25 discipline): every probability
  * input is an exact integer (counts, V), the quotient is one
  * correctly-rounded IEEE division, the ln's possible last-ulp libm
  * difference dies in 9-dp per-bigram rounding, per-document sums run
  * in exact decimal, and the final mean NLL is one division of that
  * exact sum by an integer, rounded to 6 dp — the DuckDB oracle
  * recomputes the whole trajectory bit-for-bit.
  *
  * Scale shape: training is ONE corpus scan into a groupBy (map-side
  * combine; the model table is bigram-vocabulary-bounded, further
  * prunable by a df floor for broadcast serving — the KenLM-pruning
  * analog); scoring is one scan of the corpus joined to the model
  * (broadcast when the model fits, shuffle hash join on (w1, w2)
  * otherwise) with no window and no driver state beyond the V scalar.
  */
object LangModel {

  private def tokensOf(textCol: Column): Column =
    graft.functions.TextFunctions.bpeTokens(lower(textCol))

  /** The adjacent-pair stream of each document with ≥ 2 tokens:
    * (…, w1, w2), one row per bigram occurrence.
    */
  private def bigramsOf(docs: DataFrame, textCol: String,
                        keep: Column*): DataFrame =
    docs.select(keep :+ tokensOf(col(textCol)).as("__t"): _*)
      .filter(size(col("__t")) >= 2)
      .select(keep :+ explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("__p"): _*)
      .select(keep :+ col("__p.0").as("w1") :+ col("__p.1").as("w2"): _*)

  /** TRAIN: the bigram count table (w1, w2, n12) from the held-in
    * slice — the entire model, bounded by the slice's bigram
    * vocabulary. `minCount` prunes the tail (KenLM-style) so the
    * serving join's build side stays broadcastable on a real corpus;
    * pruned mass falls back to the smoothing term like any unseen
    * bigram.
    */
  def trainBigramLm(docs: DataFrame, textCol: String,
                    minCount: Long = 1L): DataFrame =
    bigramsOf(docs, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)

  /** The training slice's distinct-token count — the model's V
    * scalar (one aggregate, pulled once at train time and pinned
    * beside the count table).
    */
  def vocabSize(docs: DataFrame, textCol: String): Long =
    docs.select(explode(tokensOf(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)

  /** SCORE: mean per-bigram negative log-likelihood of every document
    * with ≥ 2 tokens under the trained model —
    * (idCol, n_bigrams, nll). Lower is more fluent; shorter docs are
    * absent (no bigrams to score — an explicit contract, not a
    * silent 0). One corpus scan, left joins against the model
    * (broadcast-eligible), one combinable aggregate.
    *
    * `lambda` < 1 switches to Jelinek–Mercer INTERPOLATED smoothing —
    * P = λ·P_bigram + (1−λ)·P_unigram, with P_unigram(w₂) =
    * (C(·,w₂) + α)/(N + αV) derived from the SAME count table (right-
    * context sums + the total-bigram scalar), the standard fix for
    * add-α's over-penalty of unseen bigrams whose second word is
    * common. λ = 1 (the default) is exactly the pure add-α bigram —
    * same expression, bit-compatible with every existing gate.
    */
  def perplexityReport(docs: DataFrame, idCol: String, textCol: String,
                       bigrams: DataFrame, vocab: Long,
                       alpha: Double = 0.5,
                       lambda: Double = 1.0): DataFrame = {
    require(vocab > 0, s"vocab must be positive, got $vocab")
    require(lambda > 0 && lambda <= 1,
      s"lambda must be in (0, 1], got $lambda")
    val uni = bigrams.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    val pBi = (coalesce(col("n12"), lit(0L)).cast("double") + alpha) /
      (coalesce(col("n1"), lit(0L)).cast("double") + alpha * vocab)
    val scored0 = bigramsOf(docs, textCol, col(idCol))
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
    val scored =
      if (lambda == 1.0) scored0.select(col(idCol),
        graft.plans.Decimal128Api.unscaled(
          round(log(pBi), 9).cast("decimal(18,9)")).as("__lp"))
      else {
        val uniR = bigrams.groupBy(col("w2"))
          .agg(sum(col("n12")).as("c2"))
        // the total-bigram scalar N: one aggregate over the
        // model-sized table, a bounded driver pull. An EMPTY count
        // table sums to null — refuse loudly instead of an opaque NPE
        // (an empty or all-short held-in slice is a caller error)
        val nRow = bigrams.agg(sum(col("n12"))).head()
        require(!nRow.isNullAt(0),
          "bigram count table is empty — nothing to score against; " +
            "train on a held-in slice with at least one 2-token doc")
        val n = nRow.getLong(0)
        val pUni =
          (coalesce(col("c2"), lit(0L)).cast("double") + alpha) /
            (n.toDouble + alpha * vocab)
        scored0.join(uniR, Seq("w2"), "left")
          .select(col(idCol),
            graft.plans.Decimal128Api.unscaled(
              round(log(lit(lambda) * pBi + lit(1.0 - lambda) * pUni), 9)
                .cast("decimal(18,9)")).as("__lp"))
      }
    scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(negate(graft.plans.Decimal128Api
          .sum128Long(col("__lp"), 18, 9).cast("double")) /
          count(lit(1)).cast("double"), 6).as("nll"))
  }

  /** FILTER: the trained-quality gate — keep documents whose mean
    * NLL clears `maxNll` (the [[Corpus]] trainingFilter shape, with
    * the learned score in place of heuristics).
    */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       bigrams: DataFrame, vocab: Long, maxNll: Double,
                       alpha: Double = 0.5): DataFrame =
    docs.join(
      perplexityReport(docs, idCol, textCol, bigrams, vocab, alpha)
        .filter(col("nll") <= maxNll)
        .select(col(idCol)),
      Seq(idCol))

  /** The trigram stream of the training slice: one row per trigram
    * occurrence in documents with ≥ 3 tokens.
    */
  private def trigramsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(tokensOf(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 2),
        slice(col("__t"), lit(2), size(col("__t")) - 2),
        slice(col("__t"), lit(3), size(col("__t")) - 2))).as("__p"))
      .select(col("__p.0").as("w1"), col("__p.1").as("w2"),
        col("__p.2").as("w3"))

  /** T14d TRAIN: the trigram count table (w1, w2, w3, n123) — one
    * more count table on the exact block structure of
    * [[trainBigramLm]]; `minCount` prunes the tail the same way
    * (pruned mass falls back to the interpolated lower orders).
    */
  def trainTrigramLm(docs: DataFrame, textCol: String,
                     minCount: Long = 1L): DataFrame =
    trigramsOf(docs, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("n123"))
      .filter(col("n123") >= minCount)

  /** Every scored position of each document with ≥ 2 tokens, in ONE
    * scan: (…, w1, w2, w3) where w3 is the predicted token, w2 its
    * predecessor, and w1 the token before that — NULL at the
    * document's first scored position (no trigram context yet). The
    * null-padded shift is built by array slicing, so the stream stays
    * inside whole-stage codegen with no self-join and no second scan.
    */
  private def trigramPositionsOf(docs: DataFrame, textCol: String,
                                 keep: Column*): DataFrame =
    docs.select(keep :+ tokensOf(col(textCol)).as("__t"): _*)
      .filter(size(col("__t")) >= 2)
      .select(keep :+ explode(arrays_zip(
        concat(array(lit(null).cast("string")),
          slice(col("__t"), lit(1), size(col("__t")) - 2)),
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("__p"): _*)
      .select(keep :+ col("__p.0").as("w1") :+ col("__p.1").as("w2")
        :+ col("__p.2").as("w3"): _*)

  /** T14d — BACKOFF TRIGRAM perplexity: the T14c discipline one order
    * up. Every position i ≥ 3 scores under the three-way
    * interpolation λ₃P₃ + λ₂P₂ + λ₁P₁ —
    * P₃(w₃|w₁w₂) = (C₁₂₃+α)/(C₁₂·+αV) from the trigram table,
    * P₂(w₃|w₂) and P₁(w₃) derived from the SAME bigram table as
    * T14c — and the document's first scored position (no trigram
    * context exists) absorbs λ₃ into the bigram term:
    * (λ₃+λ₂)P₂ + λ₁P₁. That convention makes λ = (0, λ₂, λ₁)
    * degenerate BIT-EXACTLY to [[perplexityReport]]'s Jelinek–Mercer
    * form (0·P₃ adds +0.0, the first-position weight is 0+λ₂ = λ₂),
    * which the spec pins.
    *
    * Exactness is T14c verbatim: integer counts, one IEEE division
    * per probability term, left-associated multiply-adds, 9-dp ln
    * rounding, exact decimal sums, 6-dp mean — the DuckDB oracle
    * unrolls the identical trajectory. Output:
    * (idCol, n_ngrams, nll); documents with < 2 tokens are absent
    * (nothing to score), same contract as the bigram report.
    *
    * Scale: one corpus scan explodes to the position stream; the
    * trigram/bigram tables and their derived context sums are
    * model-vocabulary-bounded join sides (broadcast when pruned with
    * `minCount`, shuffle hash join otherwise); the N and V scalars
    * are bounded driver pulls — no window, no driver state.
    */
  def perplexityReportTri(docs: DataFrame, idCol: String,
                          textCol: String, trigrams: DataFrame,
                          bigrams: DataFrame, vocab: Long,
                          alpha: Double = 0.5,
                          lambda3: Double = 0.5,
                          lambda2: Double = 0.3,
                          lambda1: Double = 0.2): DataFrame = {
    require(vocab > 0, s"vocab must be positive, got $vocab")
    require(lambda3 >= 0 && lambda2 >= 0 && lambda1 >= 0 &&
      math.abs(lambda3 + lambda2 + lambda1 - 1.0) < 1e-9,
      s"lambdas must be nonnegative and sum to 1, got " +
        s"($lambda3, $lambda2, $lambda1)")
    val ctx = trigrams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("n123")).as("c12"))
    // the bigram table re-keyed to THIS position's (prev, cur) pair
    val bgR = bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
      col("n12"))
    val uniL = bigrams.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
      .select(col("w1").as("w2"), col("n1"))
    val uniR = bigrams.groupBy(col("w2")).agg(sum(col("n12")).as("c2"))
      .select(col("w2").as("w3"), col("c2"))
    // an EMPTY bigram table sums to null — refuse loudly instead of
    // an opaque NPE (same contract as perplexityReport's JM branch)
    val nRow = bigrams.agg(sum(col("n12"))).head()
    require(!nRow.isNullAt(0),
      "bigram count table is empty — nothing to score against; " +
        "train on a held-in slice with at least one 2-token doc")
    val n = nRow.getLong(0)
    val pTri =
      (coalesce(col("n123"), lit(0L)).cast("double") + alpha) /
        (coalesce(col("c12"), lit(0L)).cast("double") + alpha * vocab)
    val pBi =
      (coalesce(col("n12"), lit(0L)).cast("double") + alpha) /
        (coalesce(col("n1"), lit(0L)).cast("double") + alpha * vocab)
    val pUni =
      (coalesce(col("c2"), lit(0L)).cast("double") + alpha) /
        (n.toDouble + alpha * vocab)
    val p = when(col("w1").isNull,
        lit(lambda3 + lambda2) * pBi + lit(lambda1) * pUni)
      .otherwise(
        lit(lambda3) * pTri + lit(lambda2) * pBi + lit(lambda1) * pUni)
    trigramPositionsOf(docs, textCol, col(idCol))
      .join(trigrams, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .join(bgR, Seq("w2", "w3"), "left")
      .join(uniL, Seq("w2"), "left")
      .join(uniR, Seq("w3"), "left")
      .select(col(idCol),
        graft.plans.Decimal128Api.unscaled(
          round(log(p), 9).cast("decimal(18,9)")).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        round(negate(graft.plans.Decimal128Api
          .sum128Long(col("__lp"), 18, 9).cast("double")) /
          count(lit(1)).cast("double"), 6).as("nll"))
  }

  /** T14b — DSIR-style importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * restated on the hashed-n-gram LM this engine already trains):
    * score every document under a TARGET-domain LM and a RAW-corpus
    * LM and keep the documents whose per-token log importance ratio
    * log p_target − log p_raw = nll_raw − nll_target is largest —
    * the published recipe for tilting a web-scale corpus toward a
    * trusted domain without a learned classifier. Both per-bigram
    * scores follow [[perplexityReport]]'s exactness discipline
    * verbatim, and the final ratio is one exact IEEE subtraction of
    * the two 6-dp means, re-rounded to 6 dp — bit-identical to
    * running the two reports separately and joining (the gate's
    * oracle computes it that way); documents too short to score
    * (< 2 tokens) are absent — the explicit contract, not a silent
    * zero.
    *
    * Scale — ONE corpus scan, not two: the corpus tokenizes and
    * explodes to its bigram stream once, and BOTH models join onto
    * that single stream (four vocab-bounded/broadcastable sides);
    * one combinable aggregate carries both decimal sums. Selection
    * is a shuffle-free filter on the resulting ratio column.
    */
  def importanceReport(docs: DataFrame, idCol: String, textCol: String,
                       targetBigrams: DataFrame, targetVocab: Long,
                       rawBigrams: DataFrame, rawVocab: Long,
                       alpha: Double = 0.5): DataFrame = {
    require(targetVocab > 0 && rawVocab > 0,
      s"vocabs must be positive, got $targetVocab / $rawVocab")
    def sided(bg: DataFrame, p: String): (DataFrame, DataFrame) = (
      bg.select(col("w1"), col("w2"), col("n12").as(s"${p}n12")),
      bg.groupBy(col("w1")).agg(sum(col("n12")).as(s"${p}n1")))
    val (tBg, tUni) = sided(targetBigrams, "t_")
    val (rBg, rUni) = sided(rawBigrams, "r_")
    def lp(p: String, vocab: Long) = round(log(
      (coalesce(col(s"${p}n12"), lit(0L)).cast("double") + alpha) /
        (coalesce(col(s"${p}n1"), lit(0L)).cast("double") +
          alpha * vocab)), 9).cast("decimal(18,9)")
    def nllOf(c: Column) = round(
      negate(c.cast("double")) / count(lit(1)).cast("double"), 6)
    bigramsOf(docs, textCol, col(idCol))
      .join(tBg, Seq("w1", "w2"), "left")
      .join(tUni, Seq("w1"), "left")
      .join(rBg, Seq("w1", "w2"), "left")
      .join(rUni, Seq("w1"), "left")
      .select(col(idCol),
        graft.plans.Decimal128Api.unscaled(lp("t_", targetVocab))
          .as("__tlp"),
        graft.plans.Decimal128Api.unscaled(lp("r_", rawVocab))
          .as("__rlp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        nllOf(graft.plans.Decimal128Api.sum128Long(col("__tlp"), 18, 9))
          .as("nll_target"),
        nllOf(graft.plans.Decimal128Api.sum128Long(col("__rlp"), 18, 9))
          .as("nll_raw"))
      .withColumn("log_ratio",
        round(col("nll_raw") - col("nll_target"), 6))
  }
}
