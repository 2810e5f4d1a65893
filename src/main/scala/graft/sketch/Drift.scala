package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** TRAINING-DATA DISTRIBUTION DRIFT between a reference slice and a
  * current slice of the same corpus — the monitor a continuously-ingesting
  * pipeline runs per batch ("has the token-length / quality / score
  * distribution moved since the snapshot we trained on?").
  *
  * The statistic is total-variation distance over reference-quantile bins —
  * the same binning scheme as the population-stability-index (PSI) monitors
  * standard in production ML (equi-depth bins from the reference slice),
  * with TV in place of PSI's Σ(p−q)·ln(p/q) because TV is exactly
  * representable in integers while ln is not cross-engine stable.
  *
  * Mechanics built for hash-exactness AND scale:
  * - Bin edges are EXACT equi-depth cut points of the REFERENCE slice
  *   ([[RefineSelect.exactRangeBounds]] — O(log_B range) narrow scans, no
  *   sort), so every reference bin holds ~n_ref/k mass by construction
  *   and drift reads directly as current-side imbalance.
  * - The per-bin statistic is the INTEGER-scaled total-variation term
  *   |n_ref(b)·N_cur − n_cur(b)·N_ref|; total-variation distance is
  *   Σ terms / (2·N_ref·N_cur). All-integer ⇒ bit-identical in any
  *   engine — no ln/division, which is what keeps a PSI-style monitor
  *   out of oracle reach (IEEE `ln` is not cross-engine stable).
  * - One pass over the corpus after the bounds (a single
  *   map-side-combined groupBy on the codegen'd bin expression); the
  *   only collect is the k-row binned frame itself (bounded by `numBins`).
  */
object Drift {

  /** One row per occupied bin: (bin, n_ref, n_cur, tv_term). Rows where
    * `value` is null are dropped; `isRef` must be a boolean column
    * partitioning the remainder. TV distance = Σ tv_term / (2·Nr·Nc). */
  def binnedDrift(df: DataFrame, isRef: Column, value: Column, numBins: Int,
                  buckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    val tagged = df.select(isRef.as("__ref"), value.cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val bounds = RefineSelect.exactRangeBounds(
      tagged.where(col("__ref")), col("__v"), numBins, buckets)
    val binned = tagged
      .groupBy(RefineSelect.binOf(col("__v"), bounds).cast("long").as("bin"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur"))
      .collect() // ≤ numBins rows by construction (binOf range is [0, k))
    compare(spark,
      binned.map(r => r.getLong(0) -> r.getLong(1)).toMap,
      binned.map(r => r.getLong(0) -> r.getLong(2)).toMap)
  }

  /** The shared comparison tail: overflow-guarded integer TV terms over
    * the union of occupied bins. Worst term is Nr·Nc — representable iff
    * the product fits a long (each side < ~3e9 rows); beyond that, drift
    * should be computed per shard or the counts pre-scaled — fail
    * loudly, not wrap. */
  private def compare(spark: SparkSession, refCounts: Map[Long, Long],
                      curCounts: Map[Long, Long]): DataFrame = {
    val nr = refCounts.values.sum
    val nc = curCounts.values.sum
    require(nr == 0 || nc == 0 || nr <= Long.MaxValue / nc,
      s"drift: N_ref*N_cur = $nr*$nc overflows the integer TV scale")
    import spark.implicits._
    (refCounts.keySet ++ curCounts.keySet).toSeq.sorted.map { b =>
      val (cr, cc) = (refCounts.getOrElse(b, 0L), curCounts.getOrElse(b, 0L))
      (b, cr, cc, math.abs(cr * nc - cc * nr))
    }.toDF("bin", "n_ref", "n_cur", "tv_term")
  }

  /** The drift monitor IN the ingest stream — the production shape: bins
    * and reference counts are FROZEN from a static snapshot (one bounds
    * computation + one k-row collect, before the stream starts), then
    * every arriving micro-batch aggregates only `groupBy(bin).count` —
    * a k-row streaming state, no raw rows retained. The drained snapshot
    * is compared against the frozen reference exactly like
    * [[binnedDrift]], so a bounded drain over the same rows is
    * row-identical to the batch form (q253's oracle IS q252's). Complete
    * output mode: each trigger emits the cumulative per-bin counts —
    * the monitor's natural "distribution so far" semantics. */
  def driftOverParquet(spark: SparkSession, refDf: DataFrame, refValue: Column,
                       parquetGlob: String, schema: StructType,
                       streamValue: Column, streamFilter: Column,
                       numBins: Int, name: String,
                       buckets: Int = 1024): DataFrame = {
    val ref = refDf.select(refValue.cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val bounds = RefineSelect.exactRangeBounds(ref, col("__v"), numBins, buckets)
    val refCounts = ref
      .groupBy(RefineSelect.binOf(col("__v"), bounds).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_ref"))
      .collect() // ≤ numBins rows
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val counts = spark.readStream.schema(schema).parquet(parquetGlob)
      .where(streamFilter)
      .select(streamValue.cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(RefineSelect.binOf(col("__v"), bounds).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_cur"))
    val q = counts.writeStream
      .outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val cur = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rows are fully collected — the memory-sink view has no further use
    spark.catalog.dropTempView(name)
    compare(spark, refCounts, cur)
  }
}
