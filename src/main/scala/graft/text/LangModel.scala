package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style corpus
  * quality gate (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", LREC 2020): train a small LM on a trusted
  * reference slice, score every candidate document's perplexity under it,
  * and keep the low-perplexity (reference-like) documents. The classic
  * deployment trains KenLM on Wikipedia; here the LM is a bigram model with
  * count-threshold vocabulary and add-one smoothing, built and applied
  * entirely as DataFrame plans.
  *
  * Plan shape (the 100 TB posture):
  *   - the vocabulary is heavy-hitter thresholded (global count >= minCount),
  *     so it is natural-language-sized regardless of corpus size and rides
  *     as a broadcast to the token→vocab mapping joins;
  *   - OOV mapping happens AFTER pairing (mapping each side of a bigram
  *     independently equals mapping the token stream first — per-token
  *     substitution commutes with adjacency), so no positional window and
  *     no per-doc sort is ever needed: bigrams come straight off the token
  *     array as a codegen'd `transform`;
  *   - model counts are ordinary partial-aggregated groupBys; the one big
  *     join — candidate bigram facts against the bigram count table — is a
  *     shuffle equi-join on (w1, w2), exactly what AQE handles;
  *   - context counts (≤ V+1 rows) and the 1-row V scalar are broadcasts.
  *
  * Two scoring modes, the repo's q139/q197 convention:
  *   - [[LangModel.scorePpm]]: EXACT integer-scaled likelihood — each
  *     bigram contributes floor(1e6·(c12+1)/(c1+V)) in pure long
  *     arithmetic, so any ANSI engine reproduces the scores and the filter
  *     decisions bit-identically (the oracle mode). Higher = more
  *     reference-like (it is a scaled probability, not a perplexity).
  *   - [[LangModel.scorePerplexity]]: true perplexity
  *     exp(−(1/n)·Σ ln p(w2|w1)) — the production mode, float-typed,
  *     pinned by a differential spec against driver-side scalar math.
  */
object LangModel {

  /** A trained bigram LM, all lazy plans — nothing is materialized until a
    * scoring query runs.
    *
    * @param vocab    kept tokens, 1 column `tok` (count >= minCount on the
    *                 training slice); everything else maps to `<unk>`
    * @param contexts (w1, c1) — bigram-left context counts over the mapped
    *                 training stream; at most V+1 rows
    * @param pairs    (w1, w2, c12) — mapped bigram counts
    * @param vrow     1 row, column `v` = |vocab| + 1 (the `<unk>` slot) —
    *                 the add-one smoothing denominator offset
    */
  final case class BigramLM(vocab: DataFrame, contexts: DataFrame,
                            pairs: DataFrame, vrow: DataFrame)

  val Unk = "<unk>"

  /** Adjacent-token pairs as (w1, w2) structs straight off a token array —
    * no positional explode, no window. Empty for size < 2 (the repo's
    * [[TextOps.bigramsFromTokens]] guard, same reason: `sequence` with an
    * inferred step would descend).
    */
  private def pairStructs(ts: Column): Column =
    when(size(ts) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(ts) - 1, lit(1)),
        i => struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))

  /** (docId, w1, w2) bigram fact rows for a corpus slice. */
  private def bigramFacts(docs: DataFrame, docId: String, textCol: String): DataFrame = {
    val toks = docs.select(col(docId).as("__doc"), TextOps.tokens(col(textCol)).as("__ts"))
    toks.select(col("__doc"), explode(pairStructs(col("__ts"))).as("__p"))
      .select(col("__doc"), col("__p.w1").as("__w1r"), col("__p.w2").as("__w2r"))
  }

  /** Map both sides of the bigram facts into vocab ∪ {<unk>}. The vocab is
    * broadcast (heavy-hitter thresholded ⇒ bounded size); two left joins,
    * one per side.
    */
  private def mapToVocab(facts: DataFrame, vocab: DataFrame): DataFrame =
    facts
      .join(broadcast(vocab.select(col("tok").as("__v1"))),
        col("__w1r") === col("__v1"), "left")
      .join(broadcast(vocab.select(col("tok").as("__v2"))),
        col("__w2r") === col("__v2"), "left")
      .select(col("__doc"),
        coalesce(col("__v1"), lit(Unk)).as("__w1"),
        coalesce(col("__v2"), lit(Unk)).as("__w2"))

  /** Train a bigram LM on `refDocs` (the trusted reference slice).
    *
    * @param minCount vocabulary threshold: tokens whose GLOBAL count on the
    *                 reference slice is >= minCount are kept; the rest are
    *                 `<unk>`. This is what bounds the model size at any
    *                 corpus scale.
    */
  def trainBigram(refDocs: DataFrame, docId: String, textCol: String,
                  minCount: Long): BigramLM = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val vocab = refDocs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select("tok")
    val mapped = mapToVocab(bigramFacts(refDocs, docId, textCol), vocab)
    val pairs = mapped.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    val contexts = mapped.groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val vrow = vocab.agg((count(lit(1)) + 1L).as("__v"))
    BigramLM(vocab, contexts, pairs, vrow)
  }

  /** Per-bigram fact rows of the candidate docs, joined to the model:
    * (doc, c12, c1, v) with unseen counts as 0. The (w1,w2) join is the one
    * big shuffle; contexts and v are broadcasts.
    */
  private def joined(docs: DataFrame, docId: String, textCol: String,
                     lm: BigramLM): DataFrame =
    mapToVocab(bigramFacts(docs, docId, textCol), lm.vocab)
      .join(lm.pairs, Seq("__w1", "__w2"), "left")
      .join(broadcast(lm.contexts), Seq("__w1"), "left")
      .crossJoin(broadcast(lm.vrow))
      .select(col("__doc"),
        coalesce(col("__c12"), lit(0L)).as("__c12"),
        coalesce(col("__c1"), lit(0L)).as("__c1"),
        col("__v"))

  /** EXACT mode: per-doc Σ floor(1e6·(c12+1)/(c1+V)) in long arithmetic.
    * Output: (docId, n_bigrams, score_ppm, mean_ppm) — mean_ppm is the
    * length-normalized gate statistic (floor division, still exact).
    * Docs with fewer than 2 tokens have no bigrams and are absent.
    */
  def scorePpm(docs: DataFrame, docId: String, textCol: String,
               lm: BigramLM): DataFrame =
    joined(docs, docId, textCol, lm)
      .select(col("__doc"),
        expr("(__c12 + 1) * 1000000 div (__c1 + __v)").as("__t"))
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__t")).as("score_ppm"))
      .select(col("__doc").as(docId), col("n_bigrams"), col("score_ppm"),
        expr("score_ppm div n_bigrams").as("mean_ppm"))

  /** Production mode: true bigram perplexity exp(−(1/n)·Σ ln p). Lower =
    * more reference-like. Output: (docId, n_bigrams, ppl).
    */
  def scorePerplexity(docs: DataFrame, docId: String, textCol: String,
                      lm: BigramLM): DataFrame =
    joined(docs, docId, textCol, lm)
      .select(col("__doc"),
        log((col("__c12") + 1.0) / (col("__c1") + col("__v"))).as("__lp"))
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__s"))
      .select(col("__doc").as(docId), col("n_bigrams"),
        exp(-col("__s") / col("n_bigrams")).as("ppl"))

  /** The CCNet gate: keep candidate docs whose perplexity under the
    * reference LM is at most `maxPpl`. Returns the candidate rows
    * unchanged plus the `ppl` column. Docs without bigrams are dropped
    * (unscorable).
    */
  def perplexityGate(docs: DataFrame, docId: String, textCol: String,
                     lm: BigramLM, maxPpl: Double): DataFrame =
    docs.join(
      scorePerplexity(docs, docId, textCol, lm)
        .filter(col("ppl") <= maxPpl).select(col(docId), col("ppl")),
      Seq(docId))
}
