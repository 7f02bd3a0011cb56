package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T13 — BM25 lexical retrieval (SURVEY.md §2.8): the sparse/keyword
  * complement to the dense ANN family (A1–A5) — together they are
  * hybrid retrieval. Okapi BM25 with the Lucene-style always-positive
  * idf: score(d, q) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
  * tf/(tf + k1·(1 − b + b·len/avgdl)).
  *
  * Scale shape — the inverted-index probe, not a corpus scorer:
  * postings are filtered to the QUERY's terms at the scan (a handful
  * of terms → the tf table carries only matching (doc, term) rows),
  * df for those terms is a tiny aggregate broadcast back, and the
  * final per-document sum is over ≤|query| rows per doc. A real
  * deployment materializes the postings table once
  * (doc, term, tf, len — one explode + groupBy) and serves many
  * queries from it; `bm25TopK` inlines that build for a single query.
  *
  * Cross-engine gating discipline: every input to the score is an
  * exact integer (tf, df, N, doc len, Σ len); the only transcendental
  * is the idf ln, whose possible last-ulp libm difference dies in the
  * 9-dp per-term rounding; per-term scores sum in EXACT DECIMAL
  * (order-free), and the final score rounds to 6 dp before the
  * (score desc, id) ranking — so ranks cannot be reordered by
  * float noise. The DuckDB mirror recomputes everything.
  */
object Bm25 {

  /** Query-side tokenization — MUST match the document side
    * ([[graft.functions.TextFunctions.BpePattern]] over lowercased
    * text), or a query term can never hit its postings.
    */
  def queryTerms(query: String): Seq[String] =
    graft.functions.TextFunctions.BpePattern.r
      .findAllIn(query.toLowerCase(java.util.Locale.ROOT)).toSeq.distinct

  /** Top-k documents for one query. Output: (id, score, rank), rank
    * dense 1..k by (score desc, id) — a total order. Documents
    * containing no query term score zero and are absent.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms(query)
    require(terms.nonEmpty, s"query has no tokens: '$query'")
    // one tokenize scan, persisted across the corpus-scalar pull and
    // the postings build (released after the ≤k-row result
    // materializes — the packTokenStream pattern)
    val base = graft.sources.Tables.fanOut(
        docs.select(col(idCol),
          graft.functions.TextFunctions.bpeTokens(lower(col(textCol)))
            .as("__t")))
      .withColumn("__len", size(col("__t")).cast("bigint"))
      .persist()
    try {
      // two bounded corpus scalars (N, Σlen) — exact integers
      val s = base.agg(count(lit(1)).as("n"), sum(col("__len")).as("sl"))
        .head()
      val n = s.getLong(0)
      val avgdl = s.getLong(1).toDouble / n.toDouble
      val tf = base
        .select(col(idCol), col("__len"), explode(col("__t")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy(col(idCol), col("__len"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df")) // one row per (doc, term) upstream
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5))
      val tfNorm = col("tf").cast("double") /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") /
            avgdl))
      val perTerm = tf.join(broadcast(dfT), Seq("term"))
        .select(col(idCol),
          round(idf * tfNorm, 9).cast("decimal(18,9)").as("__s"))
      val scored = perTerm.groupBy(col(idCol))
        .agg(round(sum(col("__s")).cast("double"), 6).as("score"))
      // ranking runs on the ROUNDED score (id tie-break), so float
      // noise cannot reorder ranks across engines; the top-k itself is
      // the combinable bounded aggregate — k rows ship per partition,
      // never a global sort of every matching document
      scored
        .agg(Similarity.topKByAgg(col("score"), col(idCol), k).as("__tk"))
        .select(posexplode(col("__tk")).as(Seq("__pos", "__e")))
        .select(col("__e.id").as(idCol), col("__e.score").as("score"),
          (col("__pos") + 1).cast("bigint").as("rank"))
        .localCheckpoint() // ≤k rows — materialize, then release base
    } finally { base.unpersist(); () }
  }

  /** Rank any scored table: top-k by (score desc, id asc) through the
    * combinable bounded aggregate — the generic form of the ANN/BM25
    * final stage. Output: (id, score, rank).
    */
  def rankBy(df: DataFrame, idCol: String, scoreCol: String,
             k: Int): DataFrame =
    df.agg(Similarity.topKByAgg(col(scoreCol), col(idCol), k).as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("__e.id").as(idCol), col("__e.score").as(scoreCol),
        (col("__pos") + 1).cast("bigint").as("rank"))

  /** T13b — reciprocal-rank fusion (Cormack et al. 2009): combine any
    * ranked lists — lexical BM25, dense ANN, a quality prior — by
    * rrf = Σ_lists 1/(k0 + rank), the standard hybrid-retrieval
    * merge: rank-based, so lists with incomparable score scales fuse
    * without calibration, and an id missing from a list simply
    * contributes nothing. Deterministic cross-engine: each
    * contribution is one exact-input division, contributions add in
    * fixed list order, the fused score rounds to 6 dp, and the final
    * ranking is the same bounded (score desc, id) top-k as
    * everywhere else.
    *
    * Inputs are (id, …, rank) tables — BOUNDED lists (each a prior
    * top-k), so the fusion joins k-row tables: cost is independent of
    * the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double")))
          .as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val fused = joined.select(col(idCol),
      round(contribs.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
        .reduce(_ + _), 6).as("rrf_score"))
    rankBy(fused, idCol, "rrf_score", k)
  }
}
