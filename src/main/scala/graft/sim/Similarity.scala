package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`). Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. Queries broadcast; the corpus
  *    streams — the right baseline, and the right *tool* whenever the query
  *    set is small (the 100 TB side never shuffles, each corpus partition
  *    emits at most |Q|·k rows after the per-partition window prune).
  *  - [[lshBucketTopK]]: random-hyperplane LSH — corpus hashed once to L×nbits
  *    sign buckets; candidate generation is an equi-join on (table, bucket).
  *    This is the scale path when |Q| is large: no cross product ever forms.
  *
  * All vector math is higher-order-function expressions over the native
  * `array<float>` column — codegen'd, no UDF, accumulation in double
  * left-to-right (deterministic).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each row of `queries`, the `k`
    * nearest `corpus` rows. Deterministic tie-break on corpus id. The join is
    * an explicit broadcast of the query side — the corpus side never moves.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "query_id", qVec: String = "query_vec",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val pairs = corpus.join(broadcast(queries), col(qId) =!= col(cId))
      .withColumn("cos_sim", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId).asc)
    pairs.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select(col(qId), col(cId).as("neighbor_id"), col("cos_sim"), col("__rk").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit, dim):
    * xxhash64 folded to [-1000, 1000] — reproducible across runs and
    * executors with zero state to ship.
    */
  private def planeComponent(table: Int, bit: Column, dim: Column): Column =
    (pmod(xxhash64(lit(table), bit, dim), lit(2001L)) - lit(1000L)).cast("double")

  /** Sign bucket of `vec` under `nbits` random hyperplanes of table `table`:
    * an nbits-bit integer. */
  def lshBucket(vec: Column, table: Int, nbits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nbits - 1)), bit => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) => x.cast("double") * planeComponent(table, bit, d)),
          lit(0.0d), (acc, v) => acc + v)
        when(proj > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))
      }),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** LSH-bucketed ANN: candidates share a bucket in ≥1 of `tables` hash
    * tables; exact cosine re-rank keeps top-k per query. Recall < 1 by
    * construction (tune tables/nbits); candidate generation is a bucket
    * equi-join, so the plan scales as sum of bucket sizes, not |Q|×|C|.
    */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    tables: Int = 8, nbits: Int = 12,
                    qId: String = "query_id", qVec: String = "query_vec",
                    cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, vec: String, idAs: String, vecAs: String): DataFrame =
      df.select(
        col(vec).as(vecAs), col(df.columns.head).as(idAs),
        posexplode(array((0 until tables).map(t => lshBucket(col(vec), t, nbits)): _*)).as(Seq("table", "bucket")))
    val qb = bucketed(queries.select(col(qId), col(qVec)), qVec, "q_id", "q_vec")
    val cb = bucketed(corpus.select(col(cId), col(cVec)), cVec, "c_id", "c_vec")
    val cands = qb.join(cb, Seq("table", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "q_vec", "c_id", "c_vec").distinct()
      .withColumn("cos_sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id").asc)
    cands.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select(col("q_id").as(qId), col("c_id").as("neighbor_id"), col("cos_sim"), col("__rk").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ thresh).
    * Brute-force baseline; swap candidate generation for [[lshBucketTopK]]'s
    * bucket join at scale.
    */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String, thresh: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= thresh)
      .select("id_a", "id_b", "cos_sim")
  }
}
