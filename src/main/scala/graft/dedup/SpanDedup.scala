package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT DUPLICATED-SPAN detection — the substring-level training-data
  * dedup of Lee et al. 2021 ("Deduplicating Training Data Makes Language
  * Models Better", public arXiv 2107.06499), re-expressed as relational
  * dataflow instead of a suffix array: every length-`w` word window is
  * fingerprinted, fingerprints seen ≥2 times anywhere in the corpus mark
  * their window as duplicated, and a token is "covered" when any
  * duplicated window contains it. Complements the document-level dedups
  * ([[Dedup]]): those drop whole near-identical documents; this finds the
  * boilerplate/licence-block/quotation spans REPEATED INSIDE otherwise
  * distinct documents, which doc-level similarity never reaches.
  *
  * Scale shape (the reason this is not a suffix array): the corpus never
  * materializes more than one (id, pos, 16-hex-char fingerprint) row per
  * token — O(tokens) rows, text itself never shuffles. The duplicate set
  * is a hash aggregation on the fingerprint, the mark-back an equi-join on
  * the same key (one shuffle each, both AQE-coalesced), and coverage
  * expansion fans out ≤ w rows per duplicated window. Everything else is
  * codegen'd array arithmetic inside the scan. A suffix array finds
  * arbitrary-length repeats; fixed-w windows find every repeat ≥ w tokens
  * (the paper's operating point) at equi-join cost.
  */
object SpanDedup {

  /** Whitespace tokens of lowercased `text` — the same tokenizer the rest
    * of the text layer uses ([[graft.text.HashedClassifier.features]]),
    * pinned so Spark and the DuckDB oracle agree byte-for-byte. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** (id, pos, h): one row per length-`w` window at 1-based token
    * position `pos`, `h` = first 16 hex chars of the window's md5 (64
    * bits — collision-free in practice and engine-portable, the library's
    * standard surrogate hash). Empty for docs shorter than `w`. */
  def grams(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    require(w >= 2, s"spanDedup: window must be >= 2 tokens, got $w")
    val u = tokens(col(textCol))
    val idxs = when(size(u) >= w, sequence(lit(1), size(u) - w + 1))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol).as("__id"),
        explode(transform(idxs, i => struct(i.as("pos"),
          substring(md5(array_join(slice(u, i, lit(w)), " ")), 1, 16).as("h")))).as("g"))
      .select(col("__id"), col("g.pos").as("pos"), col("g.h").as("h"))
  }

  /** Per-document span-dedup summary AND the cleaned text:
    * `(id, n_tokens, n_dup_grams, n_covered, cleaned_text)` where
    * `n_dup_grams` counts this doc's windows whose fingerprint repeats
    * anywhere in the corpus (including elsewhere in the same doc),
    * `n_covered` counts tokens inside ≥1 such window, and `cleaned_text`
    * is the document with covered tokens removed (the paper's dedup
    * transform). Docs with no duplicated span pass through verbatim
    * (modulo the lowercase/whitespace normalization). */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val g = grams(docs, idCol, textCol, w)
    val dupH = g.groupBy("h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("h")
    val marked = g.join(dupH, "h").select(col("__id"), col("pos"))
    val covered = marked
      .select(col("__id"), explode(sequence(col("pos"), col("pos") + (w - 1))).as("tp"))
      .distinct()
    val covAgg = covered.groupBy("__id")
      .agg(sort_array(collect_set(col("tp"))).as("__cov"))
    val markAgg = marked.groupBy("__id").agg(count(lit(1)).as("n_dup_grams"))
    val toks = docs.select(col(idCol).as("__id"), tokens(col(textCol)).as("__u"))
    val cov = coalesce(col("__cov"), array().cast("array<int>"))
    toks.join(markAgg, Seq("__id"), "left").join(covAgg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        size(col("__u")).cast("long").as("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        size(cov).cast("long").as("n_covered"),
        array_join(filter(col("__u"), (t, i) => !array_contains(cov, i + 1)), " ")
          .as("cleaned_text"))
  }
}
