package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL-surface registration for the custom expressions, so `spark.sql`
  * users get the same operators as the Column API:
  *
  * {{{
  *   GraftFunctions.registerAll(spark)   // imperative, current session
  *   spark.sql("SELECT simhash64(text), minhash_signature(shingle_hashes(text, 3), 64) FROM docs")
  * }}}
  *
  * or declaratively for every session via the standard extensions mechanism
  * (the way a cluster rolls the library out — no code change in user jobs):
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftSparkExtensions
  * }}}
  *
  * Integer parameters arrive as foldable literals (the SQL-function calling
  * convention for static arguments).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name -> (usage doc, builder). Single source of truth for both
    * registration paths. */
  private[functions] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes", "shingle_hashes(text, n) - xxhash64 of each word n-gram", {
      case Seq(text, n) => HashExprs.ShingleHashes(text, intArg(n, "shingle n"))
      case args => throw new IllegalArgumentException(s"shingle_hashes(text, n): got ${args.length} args")
    }),
    ("gopher_repetition_stats", "gopher_repetition_stats(text) - struct of the 18 Gopher repetition-rule statistics", {
      case Seq(text) => RepetitionExprs.GopherRepetitionStats(text)
      case args => throw new IllegalArgumentException(s"gopher_repetition_stats(text): got ${args.length} args")
    }),
    ("shingle_set", "shingle_set(text, n) - distinct word n-gram shingle strings, first-occurrence order", {
      case Seq(text, n) => HashExprs.ShingleSet(text, intArg(n, "shingle n"))
      case args => throw new IllegalArgumentException(s"shingle_set(text, n): got ${args.length} args")
    }),
    ("minhash_signature", "minhash_signature(hashes, k) - k-entry MinHash signature", {
      case Seq(hashes, k) => HashExprs.MinHashSignature(hashes, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"minhash_signature(hashes, k): got ${args.length} args")
    }),
    ("det_shingle_hashes", "det_shingle_hashes(text, n) - 28-bit md5 prefix of each word n-gram (engine-portable family)", {
      case Seq(text, n) => HashExprs.DetShingleHashes(text, intArg(n, "shingle n"))
      case args => throw new IllegalArgumentException(s"det_shingle_hashes(text, n): got ${args.length} args")
    }),
    ("det_minhash_signature", "det_minhash_signature(hashes, k) - k-entry deterministic affine MinHash signature (md5 family)", {
      case Seq(hashes, k) => HashExprs.DetMinHashSignature(hashes, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"det_minhash_signature(hashes, k): got ${args.length} args")
    }),
    ("winnow_select", "winnow_select(hashes, w) - robust-winnowing window minima (rightmost ties, deduped)", {
      case Seq(hashes, w) => HashExprs.WinnowSelect(hashes, intArg(w, "window w"))
      case args => throw new IllegalArgumentException(s"winnow_select(hashes, w): got ${args.length} args")
    }),
    ("simhash64", "simhash64(text) - 64-bit SimHash fingerprint", {
      case Seq(text) => HashExprs.SimHash64(text)
      case args => throw new IllegalArgumentException(s"simhash64(text): got ${args.length} args")
    }),
    ("sorted_intersect_size", "sorted_intersect_size(a, b) - merge-scan intersection size of sorted arrays", {
      case Seq(a, b) => HashExprs.SortedIntersectSize(a, b)
      case args => throw new IllegalArgumentException(s"sorted_intersect_size(a, b): got ${args.length} args")
    }),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of float vectors", {
      case Seq(a, b) => VectorExprs.CosineSim(a, b)
      case args => throw new IllegalArgumentException(s"cosine_sim(a, b): got ${args.length} args")
    }),
    ("dot_product", "dot_product(a, b) - dot product of float vectors", {
      case Seq(a, b) => VectorExprs.DotProduct(a, b)
      case args => throw new IllegalArgumentException(s"dot_product(a, b): got ${args.length} args")
    }),
    ("hyperplane_buckets", "hyperplane_buckets(vec, tables, nbits) - LSH sign buckets", {
      case Seq(vec, tables, nbits) =>
        LshExprs.HyperplaneBuckets(vec, intArg(tables, "tables"), intArg(nbits, "nbits"))
      case args => throw new IllegalArgumentException(s"hyperplane_buckets(vec, tables, nbits): got ${args.length} args")
    }),
    ("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonical composition (UAX #15)", {
      case Seq(s) => StringExprs.NfcNormalize(s)
      case args => throw new IllegalArgumentException(s"nfc_normalize(s): got ${args.length} args")
    }),
    ("bounded_levenshtein", "bounded_levenshtein(a, b, k) - edit distance if <= k else -1", {
      case Seq(a, b, k) => StringExprs.BoundedLevenshtein(a, b, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"bounded_levenshtein(a, b, k): got ${args.length} args")
    }))

  /** Imperative per-session registration. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }

  /** Declarative injection for `spark.sql.extensions` (see
    * [[GraftSparkExtensions]]). */
  def injectAll(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, null, name, usage, ""),
        builder))
    }
}

/** `spark.sql.extensions=graft.functions.GraftSparkExtensions` — standard
  * extensions hook: every session built on the cluster gets the custom
  * functions AND the graft optimizer rules without calling
  * [[GraftFunctions.registerAll]]. The range-join rule is conf-gated
  * ([[graft.plans.RangeJoinRule.BinWidthConf]]), so injecting it is free
  * until a session opts in with a bin width. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injectAll(ext)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
