package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeEpochs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val feats = graft.SparkEntry.qualityFeatures(docs)
    val featCols = (0 to 6).map(i => s"f$i")
    val trainSet = feats.filter(col("doc_id") % 2 === 0)
      .withColumn("y", when(col("doc_id") % 4 === 0, lit(1L)).otherwise(lit(-1L)))
      .localCheckpoint(true)
    println(s"[probe] trainSet rows=${trainSet.count()} parts=${trainSet.rdd.getNumPartitions}")
    var w = Array.fill(featCols.length)(0L)
    for (e <- 1 to 8) {
      val t0 = System.nanoTime()
      val mis = graft.sim.Perceptron.dot(featCols, w.toSeq) * col("y") <= 0
      val upd = trainSet
        .select(featCols.map(f =>
          sum(when(mis, col("y") * col(f).cast("decimal(38,0)"))
            .otherwise(lit(java.math.BigDecimal.ZERO))).as(f)): _*)
        .collect()(0)
      var i = 0
      while (i < w.length) {
        val di = if (upd.isNullAt(i)) 0L
                 else upd.getDecimal(i).toBigIntegerExact.longValueExact()
        w(i) = Math.addExact(w(i), di); i += 1
      }
      println(f"[probe] epoch $e  ${(System.nanoTime() - t0) / 1e9}%6.3fs  w0=${w(0)}")
    }
    // same with a coalesced train set
    val ts2 = trainSet.coalesce(4).localCheckpoint(true)
    ts2.count()
    w = Array.fill(featCols.length)(0L)
    for (e <- 1 to 4) {
      val t0 = System.nanoTime()
      val mis = graft.sim.Perceptron.dot(featCols, w.toSeq) * col("y") <= 0
      val upd = ts2.select(featCols.map(f =>
          sum(when(mis, col("y") * col(f).cast("decimal(38,0)"))
            .otherwise(lit(java.math.BigDecimal.ZERO))).as(f)): _*).collect()(0)
      var i = 0
      while (i < w.length) {
        val di = if (upd.isNullAt(i)) 0L else upd.getDecimal(i).toBigIntegerExact.longValueExact()
        w(i) = Math.addExact(w(i), di); i += 1
      }
      println(f"[probe] coalesced epoch $e  ${(System.nanoTime() - t0) / 1e9}%6.3fs")
    }
    spark.stop()
  }
}
