package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Phase probe for the q289/q292 calibration chain. */
object ProfileCalib {
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
    import spark.implicits._

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[calib] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    // warmup
    Tables.documents(spark, sfDir).limit(100).count()

    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val feats = graft.SparkEntry.qualityFeatures(docs)
    val featCols = (0 to 6).map(i => s"f$i")

    val pageFix = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"),
        (pmod(col("doc_id"), lit(8L)) + 3L).as("__k"))
      .withColumn("__nl", expr("(size(__toks) + __k - 1) div __k"))
      .withColumn("__lines", when(col("__nl") > 0L,
          transform(sequence(lit(0L), col("__nl") - 1L), i =>
            concat(
              array_join(slice(col("__toks"),
                (i * col("__k") + 1L).cast("int"), col("__k").cast("int")), " "),
              element_at(array(lit("."), lit("!"), lit(""), lit("?")),
                (pmod(i + col("doc_id"), lit(4L)) + 1L).cast("int")))))
        .otherwise(array().cast("array<string>")))
      .withColumn("__extras", filter(array(
          when(pmod(col("doc_id"), lit(13L)) === 0L,
            lit("Lorem ipsum dolor sit amet.")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17L)) === 0L,
            lit("please enable javascript to continue browsing.")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(19L)) === 0L,
            lit("body { display: none }")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7L)) === 0L,
            lit("too short here.")).otherwise(lit(""))),
        x => length(x) > 0))
      .select(col("doc_id"),
        array_join(concat(col("__lines"), col("__extras")), "\n").as("page"))

    val teacher = TextOps.c4Flags(pageFix, "page").select(col("doc_id"), col("c4_pass"))
    phase("teacher noop (page+c4flags)")(noop(teacher))
    phase("teacher noop again")(noop(teacher))

    val trainSet = feats.filter(col("doc_id") % 2 === 0)
      .join(teacher, "doc_id")
      .withColumn("y", when(col("c4_pass"), lit(1L)).otherwise(lit(-1L)))
      .localCheckpoint(false)
    phase("trainSet materialize (count)")(trainSet.count())
    val w = phase("Perceptron.train 4 epochs")(
      graft.sim.Perceptron.train(trainSet, "y", featCols, epochs = 4))
    val dotCol = graft.sim.Perceptron.dot(featCols, w.toSeq).cast("long")
    val groups = phase("groups agg+collect")(
      trainSet
        .select(dotCol.as("score"),
          when(col("y") === 1L, lit(1L)).otherwise(lit(0L)).as("pos1"))
        .groupBy("score").agg(sum("pos1").as("p"), count(lit(1)).as("n"))
        .orderBy("score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    println(s"[calib] n score groups = ${groups.size}")
    val cal = graft.sim.Isotonic.pavQ16(groups)
    println(s"[calib] n PAV blocks = ${cal.size}")
    val steps = cal.zip(cal.drop(1).map(c => Some(c._1)) :+ None)
      .map { case ((lo, q), hi) => (lo, hi, q) }
    val bdf = broadcast(steps.toDF("lo", "hi", "q16"))
    val firstQ = cal.head._2
    val applied = feats.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), dotCol.as("score"))
      .join(bdf, col("score") >= col("lo") &&
        (col("hi").isNull || col("score") < col("hi")), "left")
      .select(col("doc_id"), col("score"),
        coalesce(col("q16"), lit(firstQ)).as("calib_q16"))
    phase("apply step table noop")(noop(applied))
    phase("apply step table noop again")(noop(applied))
    val rollup = applied
      .join(teacher, "doc_id")
      .groupBy("calib_q16")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c4_pass"), lit(1L)).otherwise(lit(0L))).as("n_pos"))
      .select(col("calib_q16"), col("n_docs"), col("n_pos"),
        abs(col("n_pos") * lit(65536L) - col("calib_q16") * col("n_docs")).as("gap_q16n"))
    phase("q292 rollup noop")(noop(rollup))
    phase("q292 rollup noop again")(noop(rollup))
    spark.stop()
  }
}
