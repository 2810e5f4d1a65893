package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class StatefulSpec extends SparkSpec {

  private val raw = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("transformWithState running agg converges to the batch groupBy answer") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val got = Stateful.runningUserAggOverParquet(
      spark, s"$sfDir/events.parq*", raw,
      centsExpr = "cast(cast(value as decimal(18,4)) * 10000 as long)",
      name = "stateful_spec_sink")
    val want = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(cast(value as decimal(18,4)) * 10000 as long)")).as("cents"))
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("state is cumulative across batches: a second drain of the same files is a no-op") {
    // AvailableNow + checkpoint-free memory sink: the helper builds a fresh
    // query each call, so this just re-derives the same converged answer —
    // determinism guard for the processor itself
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val a = Stateful.runningUserAggOverParquet(
      spark, s"$sfDir/events.parq*", raw,
      centsExpr = "cast(cast(value as decimal(18,4)) * 10000 as long)",
      name = "stateful_spec_sink_a").collect().toSet
    val b = Stateful.runningUserAggOverParquet(
      spark, s"$sfDir/events.parq*", raw,
      centsExpr = "cast(cast(value as decimal(18,4)) * 10000 as long)",
      name = "stateful_spec_sink_b").collect().toSet
    assert(a === b)
  }
}
