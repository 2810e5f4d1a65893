package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan, J. Algorithms 2005) with the
  * repo's deterministic md5-affine hash family — the mergeable
  * frequency-sketch complement to the exact SpaceSaving heavy-hitters
  * (q172/q173): depth×width integer cells, point estimate = min over
  * rows, one-sided error (est ≥ exact always; E[over] ≤ 2n/width per
  * row, min over depth rows drives it down).
  *
  * Determinism: key → 28-bit md5 hash ([[Dedup.detTokenHash]]), row r's
  * column = affine permutation r of that hash mod width
  * ([[Dedup.detPerm]] — coefficients derived inline from r, so an
  * external SQL engine rebuilds the SAME sketch cell-for-cell, and both
  * the sketch table and every estimate are hash-exact, which no seeded
  * murmur sketch can offer).
  *
  * Scale shape: the sketch build is one scan + a (row, col)-keyed
  * aggregation whose output is ≤ depth·width cells regardless of input
  * size — partial aggregation collapses each partition to the same
  * bounded grid, which is the whole point of sketching at 100 TB (cells
  * from disjoint shards ADD, so per-partition/per-day sketches merge by
  * cell-wise sum). Point queries broadcast the tiny cell grid.
  */
object CountMin {

  /** The sketch cells: (row, col, cnt), one count per occupied cell.
    *
    * PERFORMANCE (r13, guide §"per-task work"): the md5 key hash is
    * row-INDEPENDENT — hash once per input row BELOW the depth-explode,
    * then derive each row's cell with the cheap affine permutation, instead
    * of re-hashing the key `depth` times (the explode used to multiply the
    * md5 work ×depth: measured 4.7 s → the md5 was the whole query). Same
    * algebra (detPerm(row, detTokenHash(k))), cell-identical output. */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2 && width <= (1 << 20),
      s"CountMin.sketch: depth=$depth width=$width")
    df.select(Dedup.detTokenHash(col(keyCol).cast("string")).as("__h"))
      .select(col("__h"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .groupBy(col("row"), (Dedup.detPerm(col("row"), col("__h")) % width).as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `keys` against a built sketch: min over the
    * depth row-cells each key hashes to. The cell grid is broadcast —
    * the key side streams. LEFT join + coalesce(cnt, 0): an occupied-cells
    * sketch omits zero cells, so a queried key that hashes to any
    * unoccupied cell must estimate 0 (the key was never sketched), not
    * vanish from the output or take its min over fewer than depth rows
    * (r7 advisor — the general point-query contract covers absent keys). */
  def estimates(keys: DataFrame, keyCol: String, cells: DataFrame,
                depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol),
        Dedup.detTokenHash(col(keyCol).cast("string")).as("__h"))
      .select(col(keyCol), col("__h"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("col", Dedup.detPerm(col("row"), col("__h")) % width)
      .drop("__h")
      .join(broadcast(cells), Seq("row", "col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** EQUI-JOIN SIZE ESTIMATE from two sketches over the SAME key domain
    * (the AGMS/count-min inner-product bound, Alon-Matias-Szegedy '96 /
    * Cormode-Muthukrishnan '05): |A ⋈ B| = Σ_k a_k·b_k ≤ per-row
    * Σ_col cntA·cntB, and the MIN over depth rows is the estimate —
    * always ≥ the true size, tightening with width. The cardinality-
    * estimation primitive a distributed optimizer consults before
    * choosing broadcast vs shuffle — two depth·width grids stand in for
    * two 100 TB scan statistics. One row out.
    */
  def joinSizeEstimate(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.select(col("row"), col("col"), col("cnt").as("ca"))
      .join(cellsB.select(col("row"), col("col"), col("cnt").as("cb")),
        Seq("row", "col"))
      .groupBy(col("row"))
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join_size"))
}
