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
    graft.functions.ArrayExprs.adjacent_pairs(ts)

  /** The retired HOF form — kept as the kernel's differential oracle
    * (LangModelSpec pins the two bit-identical; the per-element lambda
    * evaluated INTERPRETED, which priced every bigram fact at µs). */
  private[text] def pairStructsHof(ts: Column): Column =
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

  // ---------------------------------------------------------------------
  // Kneser–Ney smoothing — the industry-standard n-gram smoothing (Kneser
  // & Ney 1995; Chen & Goodman 1999 established it as the strongest
  // classical method; KenLM — the LM CCNet actually deploys for this
  // filter — implements its "modified" variant). Absolute-discount form
  // with d = 3/4, which keeps EVERY probability an exact rational with
  // integer numerator/denominator, so Q16 fixed-point log scoring is
  // hash-exact across engines.
  //
  //   P(w2|w1) = max(c12 − d, 0)/c1 + d·t1/c1 · Pc(w2)      if c1 > 0
  //            = Pc(w2)                                       if c1 = 0
  //   Pc(w2)   = (r2 + 1)/(R + V)          (add-one continuation floor)
  //
  // where t1 = N1+(w1,·) distinct followers of w1, r2 = N1+(·,w2)
  // distinct predecessors of w2, R = N1+(·,·) total bigram types, V =
  // |vocab|+1 slots. With d = 3/4 and common denominator 4·c1·(R+V):
  //
  //   num = max(4·c12 − 3, 0)·(R+V) + 3·t1·(r2+1),  den = 4·c1·(R+V)
  //
  // Exactness: Σ_{w2} P(w2|w1) = 1 for every seen w1 — the discount mass
  // d·t1 freed from the t1 seen followers is exactly the λ(w1) weight on
  // Pc, and Σ Pc = (R+V)/(R+V) = 1 (KnSpec proves the rational identity
  // with BigInt sums on the trained frames). Hence num ≤ den per term and
  // the per-bigram negative log is a non-negative long.
  // ---------------------------------------------------------------------

  /** A trained Kneser–Ney bigram LM. `pairs` is the SUFFICIENT STATISTIC:
    * contexts (c1 = Σ c12, t1 = row count), continuations (r2) and totals
    * (R, V) all derive from it without touching the corpus again, so
    * training is ONE pass over the reference slice (the pairs plan carries
    * a lazy localCheckpoint — it is referenced four times below and once
    * per scoring join, and Spark re-executes shared subtrees per
    * reference).
    *
    * @param vocab         kept tokens (count >= minCount), 1 column `tok`
    * @param pairs         (__w1, __w2, __c12) mapped bigram counts
    * @param contexts      (__w1, __c1, __t1) — ≤ V+1 rows, broadcastable
    * @param continuations (__w2, __r2) — ≤ V+1 rows, broadcastable
    * @param totals        1 row (__r, __v)
    */
  final case class KnLM(vocab: DataFrame, pairs: DataFrame,
                        contexts: DataFrame, continuations: DataFrame,
                        totals: DataFrame)

  /** Train a Kneser–Ney bigram LM on `refDocs`. Same vocabulary contract
    * as [[trainBigram]] (global count >= minCount, rest `<unk>`), so the
    * model stays heavy-hitter bounded at any corpus scale. Count envelope
    * for the Q16 scorer: exact while c1·(R+V) < 2^61 — at web scale
    * (c1 ≤ 10^12 tokens, R+V ≤ 10^6 types after thresholding) that is
    * 4·10^18 < 9.2·10^18, inside long range by construction of the
    * thresholded vocabulary. */
  def trainKneserNey(refDocs: DataFrame, docId: String, textCol: String,
                     minCount: Long): KnLM = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val vocab = refDocs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select("tok")
      .localCheckpoint(false)
    val pairs = mapToVocab(bigramFacts(refDocs, docId, textCol), vocab)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      .localCheckpoint(false)
    val contexts = pairs.groupBy("__w1")
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__t1"))
    val continuations = pairs.groupBy("__w2")
      .agg(count(lit(1)).as("__r2"))
    val totals = pairs.agg(count(lit(1)).as("__r"))
      .crossJoin(vocab.agg((count(lit(1)) + 1L).as("__v")))
    KnLM(vocab, pairs, contexts, continuations, totals)
  }

  /** Per-document Kneser–Ney score in Q16 fixed point — integer-exact, so
    * an external engine reproduces it bit-for-bit (the oracle mode, like
    * [[scorePpm]] for add-one). Each bigram contributes
    * flog2_q16(den) − flog2_q16(num) ≥ 0 (a Q16 negative log2 of its KN
    * probability, computed by [[graft.functions.LogExprs.flog2_q16]]
    * inside whole-stage codegen); output is
    * `(docId, n_bigrams, nlg2_q16, mean_nlg2_q16)` with mean as floor
    * division of non-negative longs (truncating and flooring division
    * agree there — engines differ on negatives, which is why the score is
    * kept negated-positive). Lower = more reference-like. Docs with fewer
    * than 2 tokens have no bigrams and are absent.
    *
    * Plan shape: the one big shuffle is the facts ⋈ pairs equi-join on
    * (w1, w2); contexts/continuations/totals are broadcasts; the per-doc
    * sum partial-aggregates map-side.
    */
  def scoreKnQ16(docs: DataFrame, docId: String, textCol: String,
                 lm: KnLM): DataFrame = {
    import graft.functions.LogExprs.flog2_q16
    val facts = mapToVocab(bigramFacts(docs, docId, textCol), lm.vocab)
      .join(lm.pairs, Seq("__w1", "__w2"), "left")
      .join(broadcast(lm.contexts), Seq("__w1"), "left")
      .join(broadcast(lm.continuations), Seq("__w2"), "left")
      .crossJoin(broadcast(lm.totals))
      .select(col("__doc"),
        coalesce(col("__c12"), lit(0L)).as("__c12"),
        coalesce(col("__c1"), lit(0L)).as("__c1"),
        coalesce(col("__t1"), lit(0L)).as("__t1"),
        coalesce(col("__r2"), lit(0L)).as("__r2"),
        col("__r"), col("__v"))
    val rv = col("__r") + col("__v")
    val num = when(col("__c1") > 0L,
        greatest(lit(4L) * col("__c12") - lit(3L), lit(0L)) * rv +
          lit(3L) * col("__t1") * (col("__r2") + lit(1L)))
      .otherwise(col("__r2") + lit(1L))
    val den = when(col("__c1") > 0L, lit(4L) * col("__c1") * rv).otherwise(rv)
    facts
      .select(col("__doc"), (flog2_q16(den) - flog2_q16(num)).as("__nl"))
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nl")).as("nlg2_q16"))
      .select(col("__doc").as(docId), col("n_bigrams"), col("nlg2_q16"),
        expr("nlg2_q16 div n_bigrams").as("mean_nlg2_q16"))
  }

  // ---------------------------------------------------------------------
  // MODIFIED Kneser–Ney (Chen & Goodman 1999 §3; the variant KenLM
  // implements): three discounts D1, D2, D3+ estimated from the bigram
  // count-of-counts n1..n4 instead of one fixed d —
  //
  //   Y  = n1/(n1 + 2·n2)            (write A := n1 + 2·n2)
  //   D1 = 1 − 2·Y·n2/n1 = n1/A
  //   D2 = 2 − 3·Y·n3/n2 = (2·A·n2 − 3·n1·n3)/(A·n2)
  //   D3 = 3 − 4·Y·n4/n3 = (3·A·n3 − 4·n1·n4)/(A·n3)
  //
  // all exact rationals on the common denominator Dden = A·n2·n3:
  //   D1 → n1·n2·n3/Dden,  D2 → (2An2−3n1n3)·n3/Dden,  D3 → (3An3−4n1n4)·n2/Dden.
  //
  // The C&G estimates can leave the legal range on degenerate count
  // distributions (this corpus at sf0.1 has n4 > n3 ⇒ D3 < 0; KenLM
  // REFUSES such stats, SRILM floors them). We floor each numerator at 1 —
  // the smallest POSITIVE rational on Dden — which keeps 0 < D(c) ≤ c, so
  // every probability stays positive AND the mass identity survives
  // exactly: the same clamped D appears in the discount and in the backoff
  // weight γ(w1) = (D1·N1(w1) + D2·N2(w1) + D3·N3+(w1))/c1, hence
  // Σ_w2 P(w2|w1) = 1 identically (MknSpec proves it in BigInt). γ ≥
  // N1+(w1)/Dden ≥ 1/Dden > 0 for every seen context, so unseen
  // continuations never hit a zero numerator.
  //
  //   P(w2|w1) = (c12 − D(c12))/c1 + γ(w1)·Pc(w2)        if c1 > 0
  //            = Pc(w2)                                    if c1 = 0
  //   Pc(w2)   = (r2 + 1)/(R + V)     (same add-one continuation floor
  //                                    as the d = 3/4 form above)
  //
  // num = (c12·Dden − Dn(c12))·(R+V) + (D1n·m1 + D2n·m2 + D3n·m3)·(r2+1)
  // den = c1·Dden·(R+V)   — exact while that product < 2^63; the
  // heavy-hitter thresholded vocab bounds bigram TYPES (so n_i and Dden),
  // and train() rejects stats outside the envelope rather than overflow.
  // ---------------------------------------------------------------------

  /** Exact clamped modified-KN discount numerators over Dden = A·n2·n3.
    * Requires n1, n2, n3 ≥ 1 (KenLM's precondition). */
  private[text] def mknDiscounts(n1: Long, n2: Long, n3: Long, n4: Long):
      (Long, Long, Long, Long) = {
    require(n1 >= 1 && n2 >= 1 && n3 >= 1,
      s"modified KN needs n1, n2, n3 >= 1, got ($n1, $n2, $n3) — " +
        "not enough low-count bigram types to estimate discounts")
    // All arithmetic in BigInt first: with web-scale count-of-counts the
    // Long products (a·n2·n3, (2an2−3n1n3)·n3, …) can wrap negative, and a
    // wrapped value would sail through the caller's < MaxValue envelope
    // check. Narrow to Long only after proving each value fits.
    val a = BigInt(n1) + 2 * BigInt(n2)
    val dden = a * n2 * n3
    val d1n = BigInt(n1) * n2 * n3
    val d2n = ((2 * a * n2 - 3 * BigInt(n1) * n3) * n3) max BigInt(1)
    val d3n = ((3 * a * n3 - 4 * BigInt(n1) * n4) * n2) max BigInt(1)
    require(dden.isValidLong && d1n.isValidLong && d2n.isValidLong && d3n.isValidLong,
      s"modified-KN discount statistics overflow Long: Dden=$dden, D1n=$d1n, " +
        s"D2n=$d2n, D3n=$d3n from (n1=$n1, n2=$n2, n3=$n3, n4=$n4) — " +
        "use trainKneserNey (d = 3/4) beyond this scale")
    (d1n.toLong, d2n.toLong, d3n.toLong, dden.toLong)
  }

  /** A trained modified-KN bigram LM. Frames as [[KnLM]], plus per-context
    * follower-type counts (m1 = N1(w1), m2 = N2(w1), m3 = N3+(w1)) on
    * `contexts` and the clamped discount numerators as plain longs (the
    * count-of-count statistics are ONE scalar-aggregate row — collected at
    * train time like every sampler bound here, then literals in the
    * scoring plan). */
  final case class MknLM(vocab: DataFrame, pairs: DataFrame,
                         contexts: DataFrame, continuations: DataFrame,
                         totals: DataFrame,
                         d1n: Long, d2n: Long, d3n: Long, dden: Long)

  /** Train modified KN on `refDocs`: same vocabulary contract and same
    * one-pass sufficient statistic as [[trainKneserNey]]; adds the
    * count-of-count scalar aggregate (one tiny driver row) for the
    * discounts and the per-context N1/N2/N3+ splits. Envelope check:
    * rejects stats where c1max·Dden·(R+V) could overflow a long. */
  def trainModifiedKn(refDocs: DataFrame, docId: String, textCol: String,
                      minCount: Long): MknLM = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val vocab = refDocs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select("tok")
      .localCheckpoint(false)
    val pairs = mapToVocab(bigramFacts(refDocs, docId, textCol), vocab)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      .localCheckpoint(false)
    val contexts = pairs.groupBy("__w1")
      .agg(sum(col("__c12")).as("__c1"),
        count(when(col("__c12") === 1L, 1)).as("__m1"),
        count(when(col("__c12") === 2L, 1)).as("__m2"),
        count(when(col("__c12") >= 3L, 1)).as("__m3"))
    val continuations = pairs.groupBy("__w2")
      .agg(count(lit(1)).as("__r2"))
    val totals = pairs.agg(count(lit(1)).as("__r"))
      .crossJoin(vocab.agg((count(lit(1)) + 1L).as("__v")))
    val row = pairs.agg(
      count(when(col("__c12") === 1L, 1)).as("n1"),
      count(when(col("__c12") === 2L, 1)).as("n2"),
      count(when(col("__c12") === 3L, 1)).as("n3"),
      count(when(col("__c12") === 4L, 1)).as("n4"),
      coalesce(sum(col("__c12")), lit(0L)).as("ctot"))
      .crossJoin(totals)
      .collect().head
    val (n1, n2, n3, n4) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (ctot, rr, vv) = (row.getLong(4), row.getLong(5), row.getLong(6))
    val (d1n, d2n, d3n, dden) = mknDiscounts(n1, n2, n3, n4)
    // den = c1·Dden·(R+V) with c1 ≤ ctot (total mapped bigram tokens)
    require(BigInt(ctot max 1L) * dden * (rr + vv) < BigInt(Long.MaxValue),
      s"modified-KN exact envelope exceeded: ctot=$ctot, Dden=$dden, (R+V)=${rr + vv} — " +
        "use trainKneserNey (d = 3/4) beyond this scale")
    MknLM(vocab, pairs, contexts, continuations, totals, d1n, d2n, d3n, dden)
  }

  /** Per-document modified-KN score in Q16 fixed point — same output
    * shape, log kernel, and plan shape as [[scoreKnQ16]]; the discounts
    * are literals in the plan. */
  def scoreMknQ16(docs: DataFrame, docId: String, textCol: String,
                  lm: MknLM): DataFrame = {
    import graft.functions.LogExprs.flog2_q16
    val facts = mapToVocab(bigramFacts(docs, docId, textCol), lm.vocab)
      .join(lm.pairs, Seq("__w1", "__w2"), "left")
      .join(broadcast(lm.contexts), Seq("__w1"), "left")
      .join(broadcast(lm.continuations), Seq("__w2"), "left")
      .crossJoin(broadcast(lm.totals))
      .select(col("__doc"),
        coalesce(col("__c12"), lit(0L)).as("__c12"),
        coalesce(col("__c1"), lit(0L)).as("__c1"),
        coalesce(col("__m1"), lit(0L)).as("__m1"),
        coalesce(col("__m2"), lit(0L)).as("__m2"),
        coalesce(col("__m3"), lit(0L)).as("__m3"),
        coalesce(col("__r2"), lit(0L)).as("__r2"),
        col("__r"), col("__v"))
    val rv = col("__r") + col("__v")
    val dn = when(col("__c12") === 0L, lit(0L))
      .when(col("__c12") === 1L, lit(lm.d1n))
      .when(col("__c12") === 2L, lit(lm.d2n))
      .otherwise(lit(lm.d3n))
    val gamma = lit(lm.d1n) * col("__m1") + lit(lm.d2n) * col("__m2") +
      lit(lm.d3n) * col("__m3")
    val num = when(col("__c1") > 0L,
        (col("__c12") * lm.dden - dn) * rv + gamma * (col("__r2") + lit(1L)))
      .otherwise(col("__r2") + lit(1L))
    val den = when(col("__c1") > 0L, col("__c1") * lm.dden * rv).otherwise(rv)
    facts
      .select(col("__doc"), (flog2_q16(den) - flog2_q16(num)).as("__nl"))
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nl")).as("nlg2_q16"))
      .select(col("__doc").as(docId), col("n_bigrams"), col("nlg2_q16"),
        expr("nlg2_q16 div n_bigrams").as("mean_nlg2_q16"))
  }
}
