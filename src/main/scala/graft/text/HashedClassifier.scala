package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HASHED LINEAR TEXT CLASSIFIER — the public fastText idea (Joulin et al.
  * 2017, "Bag of Tricks for Efficient Text Classification") reduced to its
  * Spark-native scoring shape: tokenize → unigram+bigram features → hash
  * each feature into a bounded weight table → sum the weights. Everything
  * is a codegen'd column expression over higher-order array functions
  * (`filter`/`zip_with`/`aggregate`) — per-row work, ZERO shuffle, no UDF,
  * so scoring 100 TB of documents is a single embarrassingly-parallel scan
  * (this is how production quality filters — e.g. the CCNet/GPT-3 style
  * "looks like reference corpus" gates — run at corpus scale).
  *
  * The weight function here is a deterministic surrogate (md5-derived hash
  * → integer weight in [-(span/2), span/2]) so correctness is EXACTLY
  * checkable against a relational oracle in integer arithmetic. A trained
  * model drops in by replacing [[weight]] with a lookup into a broadcast
  * weight array indexed by the same feature hash — the plan shape (and
  * therefore the scale story) is identical.
  */
object HashedClassifier {

  /** Whitespace word tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Unigrams ++ adjacent-pair bigrams ("w1 w2") — the fastText feature
    * set with n=2. Bigrams are what lift a bag-of-words gate from topical
    * to phrasal (word-order) signal. */
  def features(text: Column): Column = {
    val u = tokens(text)
    val n = size(u)
    val len = greatest(n - 1, lit(0))
    val bigrams = zip_with(
      slice(u, lit(1), len),
      slice(u, lit(2), len),
      (a, b) => concat(a, lit(" "), b))
    concat(u, bigrams)
  }

  /** The surrogate weight of one feature: first 8 md5 hex digits as an
    * integer, folded to `[-(mod-1)/2, (mod-1)/2]` via `% mod - (mod-1)/2`.
    * Pure integer arithmetic on both engines (Spark `conv(_, 16, 10)`;
    * SQL `('0x' || substring(md5(t),1,8))::BIGINT`). */
  def weight(feature: Column, mod: Int = 997): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % mod - (mod - 1) / 2

  /** The document's linear score: Σ weight(feature). */
  def score(text: Column, mod: Int = 997): Column =
    aggregate(features(text), lit(0L), (acc, t) => acc + weight(t, mod))
}
