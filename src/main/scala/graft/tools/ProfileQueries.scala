package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (guide §1): run named SparkEntry queries once
  * (after one untimed warmup query) and report, per query, wall seconds plus
  * the scheduler-level shape — job count, stage count, task count, executor
  * task time, shuffle read/write bytes, input bytes. A query whose wall time
  * is dominated by job/stage COUNT (dozens of tiny jobs) needs fewer rounds
  * or fused actions; one dominated by shuffle bytes needs guide §2; one
  * dominated by task time with low shuffle needs per-task work (§ kernels).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.ProfileQueries q292_calibration_ece ..."
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    @volatile var inB = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        tasks += si.numTasks
        taskMs += si.taskMetrics.executorRunTime
        shufR += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        shufW += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        inB += si.taskMetrics.inputMetrics.bytesRead
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup (the Bench warmup shape)
    locally {
      import org.apache.spark.sql.functions._
      val c = spark.read.parquet(s"$sfDir/customer.parquet").limit(500)
      val o = spark.read.parquet(s"$sfDir/orders.parquet").limit(500)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").agg(sum("o_totalprice")).count()
    }

    val rounds = sys.env.get("GRAFT_PROFILE_ROUNDS").map(_.toInt).getOrElse(2)
    for (r <- 1 to rounds; q <- args) {
      jobs = 0; stages = 0; tasks = 0L; taskMs = 0L; shufR = 0L; shufW = 0L; inB = 0L
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain before reading counters
      println(f"[prof r$r] $q%-30s $sec%7.2fs rows=$n%-8d jobs=$jobs%-3d stages=$stages%-4d " +
        f"tasks=$tasks%-5d taskTime=${taskMs / 1000.0}%7.1fs shufW=${shufW / 1e6}%8.1fMB " +
        f"shufR=${shufR / 1e6}%8.1fMB input=${inB / 1e6}%8.1fMB")
    }
    spark.stop()
  }
}
