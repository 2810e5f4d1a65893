package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: differential-compare pairs of SparkEntry queries (collected,
  * order-normalized) on a given sf dir. Usage:
  *   runMain graft.tools.DiffCheck <sfDir> qA=qB [qC=qD ...]
  * Exits nonzero on any mismatch. This is the quick local loop for proving a
  * scale-form query still agrees with its exact twin before the driver's
  * DuckDB oracle run does it at sf0.01.
  */
object DiffCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DiffCheck <sfDir> qA=qB ...")
    val dir = args(0)
    val spark = SparkSession.builder().master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .appName("graft-diffcheck")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", value = false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = false
    args.drop(1).foreach { pair =>
      val Array(qa, qb) = pair.split("=", 2)
      val t0 = System.nanoTime()
      val a = graft.SparkEntry.queries(qa)(spark, dir)
      val cols = a.columns.sorted.toSeq
      val av = a.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val ta = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bv = graft.SparkEntry.queries(qb)(spark, dir)
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val tb = (System.nanoTime() - t1) / 1e9
      val ok = av == bv
      if (!ok) failed = true
      println(f"DIFF $qa(${av.size}, $ta%.1fs) vs $qb(${bv.size}, $tb%.1fs): ${if (ok) "EQUAL" else "MISMATCH"}")
      if (!ok) {
        val onlyA = av.diff(bv).take(3)
        val onlyB = bv.diff(av).take(3)
        println(s"  only in $qa: ${onlyA.mkString("; ")}")
        println(s"  only in $qb: ${onlyB.mkString("; ")}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
