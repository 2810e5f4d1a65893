package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table catalog over a directory of parquet tables — the engine's
  * analog of the reference's BigQuery datasets (every stage materializes its
  * output to a named table the next stage reads,
  * covid_transforms.py:48-50 `destination_dataset_table` + WRITE_TRUNCATE).
  *
  * Handles the reference's self-overwrite pattern (read table T, write result
  * back to T — mmd_transforms.py:64-66 staging→staging, Tx_Curr→Tx_Curr ×3,
  * hts entrypoints ×2): Spark refuses to overwrite a path it is reading, so
  * [[write]] always materializes to `<table>__tmp` first, then swaps
  * directories. The extra rename is metadata-only; the write itself is the
  * same single pass.
  */
class Warehouse(val spark: SparkSession, val root: String) {

  def path(table: String): String = s"$root/$table"

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def exists(table: String): Boolean = {
    val p = new Path(path(table))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** WRITE_TRUNCATE semantics (snapshot rebuild, S6/S8). Safe when `df` reads
    * from `table` itself. */
  def write(table: String, df: DataFrame): Unit = {
    val dest = new Path(path(table))
    val tmp = new Path(path(table + "__tmp"))
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"Warehouse swap failed for $table")
  }

  /** Append (streaming metadata sink, S7). */
  def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(table))

  def rowCount(table: String): Long = read(table).count()
  def columnCount(table: String): Int = read(table).schema.length

  /** Partitioned table with DYNAMIC partition overwrite: only the partitions
    * present in `df` are replaced; the rest of the table is untouched. This
    * is the 100 TB answer to the reference's whole-table snapshot rebuild
    * (WRITE_TRUNCATE everywhere): a daily run rewrites yesterday's
    * date/SiteCode partitions, not the full history — write cost goes from
    * O(history) to O(delta). Reads with a partition predicate scan only the
    * matching directories (partition pruning — asserted in tests).
    */
  def writePartitioned(table: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path(table))

  /** Bucketed catalog table: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with NO shuffle
    * (the exchange is elided because output partitioning already satisfies
    * the join's distribution). This is the 100 TB answer to repeated
    * fact-fact joins on the same key (e.g. nightly art_mmd ⟕ vls): pay the
    * clustering once at write, never at read.
    * Registered in the session catalog (bucketing metadata lives there, not
    * in parquet), so reads go through `spark.table(name)`.
    */
  def writeBucketed(table: String, df: DataFrame, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path(table))
      .saveAsTable(table)

  def readTable(table: String): DataFrame = spark.table(table)
}
