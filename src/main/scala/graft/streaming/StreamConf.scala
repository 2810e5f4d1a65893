package graft.streaming

import org.apache.spark.sql.SparkSession

/** The save/set/run/restore dance every bounded drain in this package
  * needs: shuffle partitions sized to the state topology (state-store
  * partition count is fixed at a streaming query's FIRST run, so the
  * session default of 32 would pin 32 tiny RocksDB instances forever),
  * optionally the RocksDB provider for the stateful operators.
  *
  * One definition instead of the seven inline copies this replaced —
  * the restore logic (unset vs set-back of the provider) is easy to fork
  * silently. NOTE: this mutates SESSION-GLOBAL conf; two drains on one
  * SparkSession must not run concurrently, or the interleaved restores
  * can leave the session stuck on the drain settings (same caveat the
  * inline copies had, now stated once).
  */
private[streaming] object StreamConf {
  private val ShuffleKey = "spark.sql.shuffle.partitions"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def withStreamConf[T](spark: SparkSession, statePartitions: Int,
                        rocksdb: Boolean = false)(body: => T): T = {
    val prevShuffle = spark.conf.get(ShuffleKey)
    val prevProvider = if (rocksdb) Some(spark.conf.get(ProviderKey, "")) else None
    spark.conf.set(ShuffleKey, statePartitions.toString)
    if (rocksdb) spark.conf.set(ProviderKey, RocksDb)
    try body
    finally {
      spark.conf.set(ShuffleKey, prevShuffle)
      prevProvider.foreach { p =>
        if (p.nonEmpty) spark.conf.set(ProviderKey, p)
        else spark.conf.unset(ProviderKey)
      }
    }
  }
}
