package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RECORD-LINKAGE candidate generation — the two classic blocking
  * strategies behind every entity-resolution pipeline (reference analog:
  * the fuzzy patient-matching the IDR pipelines do upstream of their
  * SQL stages), factored out of the query layer so the scale contract is
  * stated once:
  *
  *   - [[neighborhoodPairs]] (sorted-neighborhood) is the DEFAULT linkage
  *     shape: O(n·w) candidates, one shuffle (the block window's own),
  *     linear at any scale. Reach for it first; widen `window` or refine
  *     the sort key before ever considering all-pairs.
  *   - [[blockedPairs]] (equality blocking, exact all within-block pairs)
  *     is the EXHAUSTIVE form: Σ n_block² candidates — inherently
  *     quadratic in block size. It exists as the correctness baseline /
  *     differential twin for the neighborhood form, and for genuinely
  *     small blocks. Its self-join is SALTED so no single task ever
  *     materializes a whole block² (the q46 skew pattern): task size is
  *     bounded by n_block²/saltFanout even when a block is hot — but
  *     salting bounds the TASK, not the total; the pair volume is the
  *     semantics. If the bench ratio of a blockedPairs query is
  *     super-linear, that is the operator's definition, not a plan flaw.
  *
  * Both return `(block, a, b)` where `a`/`b` are full-row structs of the
  * input's columns and `a.<idCol> < b.<idCol>` (each unordered pair once);
  * scoring/verification stays with the caller (e.g. the codegen'd
  * `bounded_levenshtein`).
  */
object Linkage {

  /** Sorted-neighborhood candidates: sort each block by `orderCols`,
    * pair every row with its next `window` neighbors via lead() — the
    * candidate band rides the window's own shuffle, O(n·w) pairs, no join.
    * `a.idCol < b.idCol` is NOT implied by sort order (ties, non-id sorts),
    * so pairs are emitted in encounter order (a = earlier row). */
  def neighborhoodPairs(entities: DataFrame, blockCol: String,
                        orderCols: Seq[String], window: Int = 3): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(col(blockCol)).orderBy(orderCols.map(col): _*)
    val all = struct(entities.columns.map(col): _*)
    entities
      .withColumn("__a", all)
      .withColumn("__nbs", array((1 to window).map(i => lead(col("__a"), i).over(w)): _*))
      .select(col(blockCol).as("block"), col("__a").as("a"), explode(col("__nbs")).as("b"))
      .filter(col("b").isNotNull)
  }

  /** Exact all-pairs within each equality block, SALTED: the probe side
    * carries `pmod(hash(id), saltFanout)`, the build side replicates each
    * row `saltFanout` times, and the join key is (block, salt) — so a
    * block's n² pairs spread over `saltFanout` tasks instead of one (the
    * single-partition hot-block failure a naive `a.block = b.block`
    * self-join guarantees). Decomposition is LOSSLESS and duplication-free:
    * every pair (x, y), x.id < y.id, matches exactly once — at y replicated
    * into x's salt group (LinkageSpec pins set-equality against the naive
    * join). Shuffle cost: build side ×saltFanout — the deliberate price of
    * bounded tasks. */
  def blockedPairs(entities: DataFrame, blockCol: String, idCol: String,
                   saltFanout: Int = 8): DataFrame = {
    require(saltFanout >= 1, "saltFanout must be >= 1")
    val all = struct(entities.columns.map(col): _*)
    val probe = entities
      .select(col(blockCol).as("block"),
        pmod(hash(col(idCol)), lit(saltFanout)).as("__salt"), all.as("a"))
      .alias("lka")
    val build = entities
      .select(col(blockCol).as("block"),
        explode(array((0 until saltFanout).map(lit(_)): _*)).as("__rep"), all.as("b"))
      .alias("lkb")
    probe.join(build,
        col("lka.block") === col("lkb.block") &&
        col("lka.__salt") === col("lkb.__rep") &&
        col(s"lka.a.$idCol") < col(s"lkb.b.$idCol"))
      .select(col("lka.block").as("block"), col("lka.a").as("a"), col("lkb.b").as("b"))
  }
}
