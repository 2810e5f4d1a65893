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
}
