package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    // warm
    docs.limit(10).count()
    for (mode <- Seq("aqe-on", "aqe-off", "aqe-on")) {
      spark.conf.set("spark.sql.adaptive.enabled", mode != "aqe-off")
      val t0 = System.nanoTime()
      val m = graft.text.Bpe.learnMergesDistributed(docs, "text", nMerges = 256)
      val n = m.count()
      println(f"[bpe] $mode%-8s merges=$n  ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    spark.stop()
  }
}
