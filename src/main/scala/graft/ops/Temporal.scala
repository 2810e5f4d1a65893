package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as builtins: the
  * backward as-of join (latest right row at-or-before each left row's time)
  * and the binned interval join (points against ranges). Both are expressed
  * as SHUFFLE-ON-EQUI-KEY plans — no range theta-join, no broadcast of a big
  * side, no nested-loop — so they run the same way on 1000 executors as on
  * local[32].
  */
object Temporal {

  /** Backward AS-OF JOIN (the kdb `aj` / pandas `merge_asof` / DuckDB
    * `ASOF JOIN` operator): for every left row, attach the payload of the
    * single right row with the greatest `rightTime <= leftTime` within the
    * same `keys` group, or nulls when no such row exists (left-outer
    * semantics, inclusive match).
    *
    * HOW (Spark-first, not a translation of any range-join engine): tag and
    * union both sides, then one window pass per key —
    * `last(payload, ignoreNulls) OVER (PARTITION BY keys ORDER BY t, side)`
    * with right rows sorting before left rows at equal timestamps, so an
    * exactly-simultaneous right row IS visible to the left row (the
    * inclusive `<=` contract). The payload rides as ONE struct column, so
    * every attached column comes from the SAME matched right row even under
    * ties elsewhere.
    *
    * Scale: a union is free (no shuffle); the whole operator costs ONE
    * shuffle + sort on `keys` — identical to what any join on `keys` pays —
    * and the sort-within-group is the merge order an interval/range join
    * needs anyway. Compare the naive formulations this replaces: a range
    * theta-join (`l.t >= r.t`) plans as a nested loop, and a per-left-row
    * `max(right.t)` subquery is a second join + re-aggregation. Window
    * partition count = |keys| groups, so skew follows key skew exactly like
    * any groupBy; no single-partition window appears.
    *
    * Right-side contract: (`keys`, `rightTime`) should be unique (pre-dedup
    * with an aggregate when it is not); otherwise "the" row at a timestamp
    * is not well defined in ANY as-of engine.
    *
    * @param payloadCols right columns to attach (must exist on `right`)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoinBackward: at least one key column")
    require(payloadCols.nonEmpty, "asofJoinBackward: at least one payload column")
    val leftOut = left.columns.toSeq
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        struct(payloadCols.map(col): _*).as("__asof_p"),
        lit(0).as("__asof_side")): _*)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
    // unionByName fills the side-specific columns (left's payload slot,
    // right's missing left columns) with nulls — no shuffle happens here
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof_m", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(leftOut.map(col) ++ payloadCols.map(c => col(s"__asof_m.$c").as(c)): _*)
  }

  /** BINNED INTERVAL JOIN — inner-join `points` (a long value `pointCol`)
    * against `intervals` (`[startCol, endCol]`, both long, inclusive) via
    * fixed-width bin bucketing: each interval explodes to the bins it
    * overlaps, each point maps to its one bin, and the match becomes an
    * EQUI-join on the bin id with the exact range test as the join residual.
    * Returns every (interval row ++ point row) pair that truly overlaps —
    * exactly the rows of the theta-join `start <= p AND p <= end`, without
    * ever planning a nested loop.
    *
    * Scale: interval expansion factor is `len/binWidth + 1` rows, so pick
    * `binWidth` near the TYPICAL interval length — then expansion is ~2×
    * and each bin pairs a bounded neighborhood instead of the whole table.
    * The shuffle key is the bin id: time-clustered data keeps locality
    * (parquet min/max on the time column still prunes), and a hot bin is
    * ordinary join skew, handled by AQE skew-split like any equi-join.
    * Callers with date/timestamp data convert to epoch days/micros first —
    * keeping this operator on longs makes the bin arithmetic exact.
    */
  def binnedIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binnedIntervalJoin: binWidth must be positive, got $binWidth")
    // Since r7 this operator IS [[graft.plans.RangeJoinRule]]: it writes the
    // join the way a user would — the plain theta band — and applies the
    // rule's band→bin rewrite EAGERLY to its own logical plan
    // (rewritePlan), so the operator form and the conf-gated optimizer
    // injection share one binning implementation and cannot drift. No
    // session conf or extraOptimizations are touched. The rewrite is
    // required to fire: if the band isn't eligible (non-integral columns),
    // this throws instead of silently running the nested loop the operator
    // exists to avoid.
    val theta = intervals.join(points,
      intervals(startCol) <= points(pointCol) && points(pointCol) <= intervals(endCol))
    val analyzed = theta.queryExecution.analyzed
    val rewritten = graft.plans.RangeJoinRule.rewritePlan(analyzed, binWidth)
    require(rewritten ne analyzed,
      s"binnedIntervalJoin: RangeJoinRule did not rewrite the band on " +
        s"($startCol <= $pointCol <= $endCol) — columns must be integral (cast dates/" +
        "timestamps to epoch days/micros first)")
    org.apache.spark.sql.graftshim.ColumnBridge.ofRows(points.sparkSession, rewritten)
  }
}
