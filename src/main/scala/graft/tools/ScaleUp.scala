package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing one by replicating
  * every fact table `factor` times with disjoint key ranges (replica i adds
  * i × (max(key)+1) to each key column), preserving FK consistency so joins
  * grow linearly, not quadratically. Dimension tables (region, nation) copy
  * unchanged. Text/embedding payloads replicate verbatim — which *adds* exact
  * duplicate structure across replicas, the realistic shape for dedup
  * operators at scale (a big corpus has more dups, not fewer).
  *
  * Purpose: the scaling-curve datum (DESIGN.md "Scaling") — run Bench at
  * sf0.1 and at the synthesized sf1 and compare per-query ratios. NOT a
  * correctness input: oracles keep running against the driver's own testdata.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 2 && factor <= 1000, s"factor $factor outside [2,1000]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS): read it as raw long nanos and
      // WRITE it back as plain INT64 nanos — Tables.events reads either
      // identically (the legacy flag only rewrites NANOS-typed columns)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def base(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L
    val reps = spark.range(factor).select(col("id").as("__rep"))
    def replicate(df: DataFrame, keys: Seq[(String, Long)], parts: Int): DataFrame = {
      val out = df.crossJoin(broadcast(reps))
      keys.foldLeft(out) { case (d, (c, b)) =>
        d.withColumn(c, (col(c) + col("__rep") * b).cast("long"))
      }.drop("__rep").repartition(parts)
    }
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$t.parquet")

    val (cust, supp, part, ord, li) =
      (read("customer"), read("supplier"), read("part"), read("orders"), read("lineitem"))
    val (ev, docs, emb) = (read("events"), read("documents"), read("embeddings"))
    val (cB, sB, pB, oB) = (base(cust, "c_custkey"), base(supp, "s_suppkey"),
      base(part, "p_partkey"), base(ord, "o_orderkey"))
    val (eB, uB, dB, vB) = (base(ev, "event_id"), base(ev, "user_id"),
      base(docs, "doc_id"), base(emb, "vec_id"))

    write(replicate(cust, Seq("c_custkey" -> cB), 8), "customer")
    write(replicate(supp, Seq("s_suppkey" -> sB), 4), "supplier")
    write(replicate(part, Seq("p_partkey" -> pB), 4), "part")
    write(replicate(ord, Seq("o_orderkey" -> oB, "o_custkey" -> cB), 16), "orders")
    write(replicate(li,
      Seq("l_orderkey" -> oB, "l_partkey" -> pB, "l_suppkey" -> sB), 32), "lineitem")
    write(replicate(ev, Seq("event_id" -> eB, "user_id" -> uB), 16), "events")
    write(replicate(docs, Seq("doc_id" -> dB), 8), "documents")
    write(replicate(emb, Seq("vec_id" -> vB), 8), "embeddings")
    write(read("region"), "region")
    write(read("nation"), "nation")
    System.err.println(s"[scaleup] $srcDir ×$factor → $dstDir done")
    spark.stop()
  }
}
