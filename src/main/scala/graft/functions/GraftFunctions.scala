package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL-surface registration for the custom expressions, so `spark.sql`
  * users get the same operators as the Column API:
  *
  * {{{
  *   GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT simhash64(text), minhash_signature(shingle_hashes(text, 3), 64) FROM docs")
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

  def registerAll(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "shingle_hashes", {
      case Seq(text, n) => HashExprs.ShingleHashes(text, intArg(n, "shingle n"))
      case args => throw new IllegalArgumentException(s"shingle_hashes(text, n): got ${args.length} args")
    })
    ColumnBridge.registerFunction(spark, "minhash_signature", {
      case Seq(hashes, k) => HashExprs.MinHashSignature(hashes, intArg(k, "k"))
      case args => throw new IllegalArgumentException(s"minhash_signature(hashes, k): got ${args.length} args")
    })
    ColumnBridge.registerFunction(spark, "simhash64", {
      case Seq(text) => HashExprs.SimHash64(text)
      case args => throw new IllegalArgumentException(s"simhash64(text): got ${args.length} args")
    })
    ColumnBridge.registerFunction(spark, "cosine_sim", {
      case Seq(a, b) => VectorExprs.CosineSim(a, b)
      case args => throw new IllegalArgumentException(s"cosine_sim(a, b): got ${args.length} args")
    })
    ColumnBridge.registerFunction(spark, "dot_product", {
      case Seq(a, b) => VectorExprs.DotProduct(a, b)
      case args => throw new IllegalArgumentException(s"dot_product(a, b): got ${args.length} args")
    })
    ColumnBridge.registerFunction(spark, "hyperplane_buckets", {
      case Seq(vec, tables, nbits) =>
        LshExprs.HyperplaneBuckets(vec, intArg(tables, "tables"), intArg(nbits, "nbits"))
      case args => throw new IllegalArgumentException(s"hyperplane_buckets(vec, tables, nbits): got ${args.length} args")
    })
  }
}
