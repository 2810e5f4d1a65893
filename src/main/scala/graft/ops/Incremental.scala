package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates — the classic
  * delta-algebra result (Gupta/Mumick, "Maintenance of Materialized Views:
  * Problems, Techniques, and Applications", IEEE DE Bulletin 1995): a
  * COUNT/SUM group-by view absorbs a change set by adding each after-image's
  * contribution and subtracting each before-image's, so refreshing the view
  * costs O(|changes| + |groups|) instead of re-scanning the table. At 100 TB
  * with a daily 0.1% churn that is the difference between touching 100 GB
  * and touching 100 TB. Pairs with [[graft.io.Versioned.changesWithImages]],
  * whose before/after row images are exactly the Δ⁻/Δ⁺ relations the
  * algebra needs (updates contribute to BOTH sides, which also makes
  * group-migrating updates correct for free).
  */
object Incremental {

  /** Apply a before/after change feed to a `GROUP BY groupCol →
    * (n_rows, sum_val)` snapshot.
    *
    * @param snapshot columns (`groupCol`, `n_rows` long, `sum_val` long) —
    *                 the materialized view at the feed's `from` version
    * @param changes  columns (`change_type` ∈ insert/update/delete,
    *                 `groupCol_before/after`, `valCol_before/after`) as
    *                 produced by `changesWithImages`
    * @return the maintained view — identical to recomputing the aggregate
    *         over the `to` version; groups whose count reaches zero vanish,
    *         new groups appear
    *
    * Scale: the change feed collapses to AT MOST 2|changes| signed
    * contribution rows, partially aggregated map-side into O(touched
    * groups) deltas, then ONE outer join against the view on the group key.
    * Nothing ever rescans the base table.
    */
  def applyCountSumDeltas(
      snapshot: DataFrame,
      changes: DataFrame,
      groupCol: String,
      valCol: String): DataFrame = {
    val minus = changes
      .filter(col("change_type").isin("delete", "update"))
      .select(col(s"${groupCol}_before").as(groupCol),
        lit(-1L).as("dn"), (-col(s"${valCol}_before")).as("dv"))
    val plus = changes
      .filter(col("change_type").isin("insert", "update"))
      .select(col(s"${groupCol}_after").as(groupCol),
        lit(1L).as("dn"), col(s"${valCol}_after").as("dv"))
    val deltas = minus.unionByName(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    snapshot.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("sum_val"))
      .filter(col("n_rows") > 0)
  }
}
