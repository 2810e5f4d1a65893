package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`; multi-file dirs
  * work identically (`spark.read.parquet` globs natively — this is the
  * Spark-side equivalent of the reference's whole-bucket load,
  * `idr_pipeline_from_server/dags/idr_load.py:83-92`).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects outright; read it as raw nanos (legacy flag) and truncate to
    * microseconds — exactly what DuckDB does internally (its TIMESTAMP is µs),
    * so oracle comparisons see identical values. Integer `div` avoids the
    * double-precision loss a `/ 1000` would introduce on epoch-nanos.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        // NTZ to match the source's isAdjustedToUTC=false (and DuckDB's naive
        // TIMESTAMP); session TZ is UTC so the wall-clock value is unchanged.
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
