package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the r13
  * optimization-round evidence artifacts (plans/r13/<query>_{before,after}.txt).
  * Usage: runMain graft.tools.PlanDumpFmt <outDir> <suffix> q1 q2 ...
  * Uses sf0.01 (plan SHAPE is scale-independent; sf0.01 keeps eager queries —
  * trainers, versioned fixtures — fast) and the bench's conf shape. */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpFmt <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(2)) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
        println(s"[plandump] wrote $q" + s"_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $q: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
