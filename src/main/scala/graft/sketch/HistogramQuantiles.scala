package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT percentiles over discrete/low-cardinality domains via a value
  * histogram — the mergeable scale path when the measure has bounded
  * distinct values (integer quantities, prices in cents, enum codes …).
  *
  * Shape: one partial-aggregated groupBy((group, value)) — the only pass
  * over the fact table, combine happens map-side — then a running sum over
  * the TINY histogram (O(distinct values) rows per group) and a min-filter
  * per requested rank. At 100 TB this computes exact percentiles with one
  * fact-table shuffle of histogram-sized payload, where a sort-based exact
  * percentile (q58) shuffles raw rows; the histogram is also mergeable
  * across partitions/days by adding counts, the property sketches are
  * usually bought for — here with NO error. For unbounded continuous
  * domains this degrades to O(n) histogram rows; that regime belongs to a
  * KLL/GK sketch (accuracy-bounded, not oracle-exact) or q58.
  *
  * Semantics are percentile_disc: rank(p) = ceil(p·n), value = smallest v
  * with cumulative count ≥ rank — all-integer given an integral value
  * column, hence hash-exact in any engine.
  */
object HistogramQuantiles {
  def discPercentiles(df: DataFrame, groupCol: String, value: Column,
                      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p <= 1 },
      s"discPercentiles: ps=$ps")
    val hist = df.select(col(groupCol), value.as("__v"))
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
    val cum = hist.select(col(groupCol), col("__v"), col("__c"),
      sum("__c").over(Window.partitionBy(col(groupCol)).orderBy(col("__v"))).as("__cum"),
      sum("__c").over(Window.partitionBy(col(groupCol))).as("__n"))
    val aggs = ps.map { case (name, p) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")), col("__v"))).as(name)
    }
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
