package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(s"===== $q =====")
      println(df.queryExecution.explainString(SimpleMode))
      df.count()
      println("----- executed -----")
      println(df.queryExecution.executedPlan.toString)
    }
  }
}
