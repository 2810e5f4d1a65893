package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are pure column
  * expressions (builtin functions + higher-order array functions) — fully
  * codegen'd, no UDFs, so they pipeline inside the parquet scan stage and scale
  * linearly with input splits (no shuffle at all for per-document scoring).
  */
object TextOps {

  /** Unicode text cleaning for ingest normalization (q190): strip the
    * zero-width characters that survive scraping (ZWSP U+200B, ZWNJ U+200C,
    * ZWJ U+200D, BOM/ZWNBSP U+FEFF) and canonically compose combining
    * sequences (NFC via the codegen'd [[graft.functions.StringExprs
    * .nfc_normalize]]) — so visually identical strings become byte-identical
    * BEFORE exact/near dedup hashes them apart. Strip-then-normalize order
    * matters: a zero-width char between a base and its combining mark blocks
    * composition. Pure column expressions, no shuffle. */
  def cleanText(text: Column): Column =
    graft.functions.StringExprs.nfc_normalize(
      regexp_replace(text, "[\u200B\u200C\u200D\uFEFF]", ""))

  /** Whitespace tokenization. `split` on \s+ yields a leading "" for texts
    * with leading whitespace; `filter` drops empties so the count is stable.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish subword proxy: a letter run is one piece, each digit its own
    * piece, each other non-space character its own piece — a deterministic
    * stand-in for a real tokenizer's piece count, cheap enough to run inline
    * over 100 TB of text. The pattern is a plain alternation (no lookaround),
    * so it means the same thing under Java regex and RE2 — which is what
    * makes the q53 oracle checkable in DuckDB.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{N}]|[^\\p{L}\\p{N}\\s]"), lit(0))).cast("long")

  def charLen(text: Column): Column = length(text).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\p{Punct}", ""))).cast("long")

  /** Count of tokens from `words` appearing in `text` (word-boundary matches).
    * Basis for stopword-ratio quality scoring and language ID.
    */
  def wordHits(text: Column, words: Seq[String]): Column = {
    val pattern = "(?i)\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b"
    size(regexp_extract_all(text, lit(pattern), lit(1))).cast("long")
  }

  /** Per-language stopword lists for the n-gram/stopword-hit language-ID
    * heuristic. Tiny on purpose: these ship to executors as literals inside
    * the codegen'd plan, no broadcast needed.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "que", "por", "para"),
  )

  /** Language-ID heuristic: argmax of per-language stopword hit counts; texts
    * with no hits (e.g. CJK under a Latin-stopword model) fall back to
    * detecting any CJK codepoint, else "und". Deterministic tie-break by list
    * order (greatest strictly-earlier wins).
    */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> wordHits(text, words) }
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang), when(score > bestScore, score).otherwise(bestScore))
    }
    when(best._2 > 0, best._1)
      .when(size(regexp_extract_all(text, lit("[\\x{4E00}-\\x{9FFF}]"), lit(0))) > 0, "zh")
      .otherwise("und")
  }

  /** ASCII content normalization (lowercase → strip non-alphanumerics →
    * collapse runs of spaces → trim) — THE canonical pre-fingerprint form:
    * md5(normalizeAscii(text)) is the corpus dedup identity, so the
    * streaming ingest (CorpusIngest) and the batch oracle (q115) must use
    * this one definition — a drifted copy would silently fork the
    * fingerprint space and break the anti-join idempotence layer. */
  def normalizeAscii(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Quality classification on cheap surface statistics — the classic
    * pretraining-corpus filter (length bounds, punctuation ratio, mean word
    * length). Returns a label so comparisons stay exact (no float thresholds
    * in the output).
    */
  def qualityBucket(text: Column): Column = {
    val nTok  = tokenCount(text)
    val nChar = charLen(text)
    val nPunct = punctCount(text)
    when(nTok < lit(5L), "too_short")
      .when(nChar > lit(20000L), "too_long")
      .when(nPunct * lit(10L) > nChar * lit(3L), "too_much_punct") // punct ratio > 0.3, integer math
      .when(nChar > nTok * lit(15L), "words_too_long")             // mean word len > 15
      .otherwise("ok")
  }

  /** The GOPHER RULE BATTERY (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", public arXiv
    * 2112.11446 §A1.1) — the named document-quality filter set production
    * pretraining pipelines actually run, each rule a PURE integer/rational
    * column comparison (no floats) so every flag and the composite verdict
    * are hash-exact and oracle-checkable:
    *
    *  - `ok_word_count`     50 ≤ words ≤ 100,000
    *  - `ok_mean_word_len`  3 ≤ mean word length ≤ 10, as
    *                        3·words ≤ Σ word chars ≤ 10·words (the char sum
    *                        is non-whitespace length — exact, no division)
    *  - `ok_symbol_ratio`   # of '#' ≤ 0.1·words AND # of '...' ≤ 0.1·words
    *                        — the paper's TWO independent symbol-to-word
    *                        tests ("greater than 0.1 for either the hash
    *                        symbol or the ellipsis" ⇒ reject), not a
    *                        combined (hashes+ellipses) bound, which would
    *                        be strictly tighter (r9 advisor)
    *  - `ok_bullet_lines`   lines starting with a bullet (-, *, •) ≤ 90%
    *  - `ok_ellipsis_lines` lines ending with '...' or '…' ≤ 30%
    *  - `ok_alpha_words`    ≥ 80% of words contain ≥1 letter
    *  - `ok_stopwords`      ≥ 2 DISTINCT members of the stop list occur
    *                        (the paper's English eight by default; pass the
    *                        corpus's function words for other languages or
    *                        synthetic vocabularies — a deployment localizes
    *                        this lexicon, the rule shape never changes)
    *
    * One projection over the text — zero shuffles, fully codegen'd; at
    * 100 TB this is scan-speed. Returns the input plus the seven flags and
    * `gopher_pass` (their conjunction). Thresholds follow the paper;
    * whitespace tokenization stands in for its word segmenter (the
    * documented engine-wide tokenizer, [[tokens]]).
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, textCol: String,
                  stopWords: Seq[String] =
                    Seq("the", "be", "to", "of", "and", "that", "have", "with")): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val nWords = tokenCount(t)
    // Σ word lengths = non-whitespace char count (whitespace tokenizer ⇒ exact)
    val wordChars = length(regexp_replace(t, "\\s", "")).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipses = size(regexp_extract_all(t, lit("\\.\\.\\.|…"), lit(0))).cast("long")
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val alphaWords = size(filter(tokens(t), w => w.rlike("\\p{L}"))).cast("long")
    require(stopWords.nonEmpty && stopWords.forall(_.matches("[A-Za-z]+")),
      s"gopherFlags: stop words must be plain alphabetic tokens, got $stopWords")
    val stopHits = stopWords
      .map(sw => when(t.rlike(s"(?i)\\b$sw\\b"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("ok_word_count", nWords >= 50L && nWords <= 100000L)
      .withColumn("ok_mean_word_len",
        nWords > 0L && wordChars >= nWords * 3L && wordChars <= nWords * 10L)
      .withColumn("ok_symbol_ratio", hashes * 10L <= nWords && ellipses * 10L <= nWords)
      .withColumn("ok_bullet_lines", bulletLines * 10L <= nLines * 9L)
      .withColumn("ok_ellipsis_lines", ellipsisLines * 10L <= nLines * 3L)
      .withColumn("ok_alpha_words", alphaWords * 10L >= nWords * 8L)
      .withColumn("ok_stopwords", stopHits >= 2L)
      .withColumn("gopher_pass",
        col("ok_word_count") && col("ok_mean_word_len") && col("ok_symbol_ratio") &&
        col("ok_bullet_lines") && col("ok_ellipsis_lines") && col("ok_alpha_words") &&
        col("ok_stopwords"))
  }

  /** The GOPHER REPETITION BATTERY (Rae et al. 2021 §A1.1, second half —
    * the 13 repetition filters that complete [[gopherFlags]] into the full
    * production quality gate). Each rule is an exact integer cross-
    * multiplication over [[graft.functions.RepetitionExprs]]'s one-pass
    * per-document statistics struct, so the whole battery is a
    * zero-shuffle codegen'd projection — scan-speed at 100 TB — and every
    * flag plus the composite is hash-provable cross-engine. Thresholds are
    * the paper's Table A1 (a document FAILS a rule when its fraction
    * EXCEEDS the threshold):
    *
    *  - `ok_dup_lines`        duplicate line fraction        ≤ 0.30
    *  - `ok_dup_paras`        duplicate paragraph fraction   ≤ 0.30
    *  - `ok_dup_line_chars`   duplicate line char fraction   ≤ 0.20
    *  - `ok_dup_para_chars`   duplicate para char fraction   ≤ 0.20
    *  - `ok_top2_chars`       top 2-gram char fraction       ≤ 0.20
    *  - `ok_top3_chars`       top 3-gram char fraction       ≤ 0.18
    *  - `ok_top4_chars`       top 4-gram char fraction       ≤ 0.16
    *  - `ok_dup5_chars` … `ok_dup10_chars`
    *                          duplicated-n-gram char fraction
    *                          ≤ 0.15/0.14/0.13/0.12/0.11/0.10
    *
    * Unit definitions (lines, paragraphs, duplicate-group occurrence
    * counting, positional n-gram coverage, code-point chars) are the
    * kernel's — see [[graft.functions.RepetitionAlgs]].
    * `repetition_pass` is the 13-flag conjunction; AND it with
    * [[gopherFlags]]' `gopher_pass` for the paper's complete filter.
    */
  def gopherRepetitionFlags(df: org.apache.spark.sql.DataFrame,
                            textCol: String): org.apache.spark.sql.DataFrame = {
    val st = graft.functions.RepetitionExprs.gopher_repetition_stats(col(textCol))
    val withStats = df.withColumn("__grs", st)
    val s = col("__grs")
    val flagged = withStats
      .withColumn("ok_dup_lines", s("dup_lines") * 10L <= s("n_lines") * 3L)
      .withColumn("ok_dup_paras", s("dup_paras") * 10L <= s("n_paras") * 3L)
      .withColumn("ok_dup_line_chars", s("dup_line_chars") * 10L <= s("line_chars") * 2L)
      .withColumn("ok_dup_para_chars", s("dup_para_chars") * 10L <= s("para_chars") * 2L)
      .withColumn("ok_top2_chars", s("top2_chars") * 10L <= s("word_chars") * 2L)
      .withColumn("ok_top3_chars", s("top3_chars") * 100L <= s("word_chars") * 18L)
      .withColumn("ok_top4_chars", s("top4_chars") * 100L <= s("word_chars") * 16L)
      .withColumn("ok_dup5_chars", s("dup5_chars") * 100L <= s("word_chars") * 15L)
      .withColumn("ok_dup6_chars", s("dup6_chars") * 100L <= s("word_chars") * 14L)
      .withColumn("ok_dup7_chars", s("dup7_chars") * 100L <= s("word_chars") * 13L)
      .withColumn("ok_dup8_chars", s("dup8_chars") * 100L <= s("word_chars") * 12L)
      .withColumn("ok_dup9_chars", s("dup9_chars") * 100L <= s("word_chars") * 11L)
      .withColumn("ok_dup10_chars", s("dup10_chars") * 10L <= s("word_chars"))
    val flags = Seq("ok_dup_lines", "ok_dup_paras", "ok_dup_line_chars",
      "ok_dup_para_chars", "ok_top2_chars", "ok_top3_chars", "ok_top4_chars",
      "ok_dup5_chars", "ok_dup6_chars", "ok_dup7_chars", "ok_dup8_chars",
      "ok_dup9_chars", "ok_dup10_chars")
    flagged
      .withColumn("repetition_pass", flags.map(col).reduce(_ && _))
      .drop("__grs")
  }

  /** Content fingerprint (md5 hex) for exact dedup — portable across engines
    * (DuckDB md5() computes the identical digest, which is what makes the
    * exact-dedup oracle checkable).
    */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** 64-bit rolling-ish document fingerprint: xxhash64 over the token stream
    * folded left-to-right, so token order matters (unlike a bag-of-words
    * hash). Pure HOF `aggregate` — codegen'd, shuffle-free. The 100 TB fast
    * path; [[fingerprintRollingChars]] is the engine-portable form (TextOpsSpec
    * pins the two differentially: identical dup-group structure, both
    * order-sensitive).
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(tokens(text), lit(1125899906842597L), (acc, t) => xxhash64(acc, t))

  /** CHARACTER-level Rabin-Karp document digest (the classic rolling
    * polynomial hash, Karp & Rabin, IBM JRD 1987): Horner's fold
    * fp = (…((0·B + c₁)·B + c₂)…) mod M over the raw codepoint sequence,
    * B = 1000003, M = 2³¹−1. Order-sensitive at CHARACTER granularity —
    * catches intra-token edits and whitespace changes that token-level
    * digests (q215's md5-polynomial, [[fingerprintRolling]]) collapse —
    * and every step is integer arithmetic on ascii codepoints, so an
    * external SQL engine replays it bit-for-bit (q40's hash-exact oracle
    * mirrors the fold as Σ cᵢ·B^(n−1−i) mod M over a recursive power
    * table — equal by ring homomorphism). Codegen'd HOF fold, zero
    * shuffle; acc < 2³¹ and B < 2²⁰ keep the product under 2⁵¹.
    */
  def fingerprintRollingChars(text: Column): Column =
    aggregate(regexp_extract_all(text, lit("."), lit(0)), lit(0L),
      (acc, c) => (acc * lit(1000003L) + ascii(c)) % lit(2147483647L))

  /** Word n-gram shingles (n consecutive tokens joined by space) — input to
    * MinHash / Jaccard dedup. Empty array when the doc has fewer than n
    * tokens.
    *
    * PERFORMANCE: `ts` MUST be a materialized column (attribute reference),
    * not a nested expression — lambda bodies re-evaluate subexpressions per
    * element, so passing `tokens(text)` here would re-split the text for
    * every shingle. Stage with `.withColumn("toks", tokens(text))` first.
    */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    filter(
      transform(ts, (_, i) => when(i + n <= size(ts), array_join(slice(ts, i + lit(1), lit(n)), " "))),
      s => s.isNotNull)

  /** Adjacent token bigrams ("a b", "b c", …) — the unit of the
    * repeated-n-gram repetition filters (Gopher-style corpus quality rules:
    * a document whose bigrams are mostly copies of each other is template or
    * looping output, not prose). Guarded `when`: Spark's `sequence(1, 0)`
    * with an inferred step would DESCEND, so short inputs return an
    * explicit empty array. Same caveat as [[shinglesFromTokens]]: pass a
    * materialized token column, not `tokens(text)` inline.
    */
  def bigramsFromTokens(ts: Column): Column =
    when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ts) - 1, lit(1)),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))

  /** Duplicate fraction of an array: (count - distinct count) / count as an
    * exact integer pair; callers divide once at the end so the only float op
    * is one IEEE division (oracle-exact). Returns (n, n_distinct) columns
    * via a struct.
    */
  def dupStats(arr: Column): Column =
    struct(size(arr).cast("long").as("n"),
      size(array_distinct(arr)).cast("long").as("n_distinct"))

  /** Sliding-window chunk START offsets for context-window packing: token
    * offsets 0, stride, 2·stride, … strictly below `nTok`. The training-data
    * chunking primitive: each start yields the chunk
    * [start, min(start+chunkSize, nTok)). Empty array for empty docs (the
    * `when` guard — `sequence` throws on inconsistent bounds with an
    * explicit positive step). */
  def chunkStarts(nTok: Column, stride: Int): Column =
    when(nTok <= 0, array().cast("array<long>"))
      .otherwise(sequence(lit(0L), nTok.cast("long") - 1L, lit(stride.toLong)))

  /** The C4 CLEANING RULES (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", public
    * arXiv 1910.10683 §2.2) — the line- and page-level filter battery the
    * C4 corpus was built with, next to [[gopherFlags]]'s document-statistic
    * battery. Line rules (a line is RETAINED only if it passes all
    * three): ends in terminal punctuation (`.`, `!`, `?`, `"`), has ≥ 5
    * words, and does not mention "javascript" (the cookie/JS-warning
    * rule). Page rules: fewer than 3 sentences after line filtering →
    * drop (sentence count = terminal punctuation marks in the retained
    * lines); "lorem ipsum" anywhere → drop; a curly brace `{` anywhere
    * (code) → drop.
    *
    * Returns per page: `n_lines` (non-blank), `n_kept` (lines retained),
    * `n_sentences`, `has_lorem`, `has_brace`, `c4_pass` (the page
    * verdict), and `clean_md5` — md5 of the retained lines re-joined with
    * `\n`, which pins the exact line-filter output in the result hash
    * without materializing cleaned pages into it. One projection over the
    * text — zero shuffles, scan-speed at 100 TB; every rule is exact
    * (regex + integer counts, no floats).
    */
  def c4Flags(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 5 &&
      !lower(l).contains("javascript"))
    val clean = array_join(kept, "\n")
    val nSent = size(regexp_extract_all(clean, lit("[.!?]"), lit(0))).cast("long")
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("n_sentences", nSent)
      .withColumn("has_lorem", lower(t).contains("lorem ipsum"))
      .withColumn("has_brace", t.contains("{"))
      .withColumn("c4_pass",
        col("n_sentences") >= 3L && !col("has_lorem") && !col("has_brace"))
      .withColumn("clean_md5", md5(clean))
  }
}
