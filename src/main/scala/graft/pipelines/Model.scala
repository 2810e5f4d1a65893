package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.io.Warehouse

/** Pipeline model — the engine's analog of the reference's Airflow task
  * graph (O1–O6 in SURVEY §2.11), as plain Scala values instead of DAG
  * syntax. A Stage is one materialized transform (one BigQueryOperator); a
  * Pipeline is one DAG; the Runner handles ordering, cross-pipeline
  * dependencies, retries and failure alerting.
  */
final case class Stage(
    name: String,                                   // = reference task_id
    sink: String,                                   // destination table
    run: (SparkSession, Warehouse) => DataFrame)

final case class Pipeline(
    name: String,
    stages: Seq[Stage],
    dependsOn: Seq[String] = Nil)                   // O2 ExternalTaskSensor edges

final case class StageFailure(pipeline: String, stage: String, error: Throwable)

/** O1 task chain + O2 cross-pipeline deps + O3 retries + O4 failure hook.
  *
  * Stage boundaries materialize to the warehouse exactly like the reference
  * (every stage output is a table — required because other pipelines read
  * them: VLS joins `art_mmd` written by MMD, vls_transforms.py:145). Within
  * a 1000-executor deployment each stage is one Spark job; the only
  * inter-stage state is the parquet table, so a retried stage is idempotent
  * (WRITE_TRUNCATE semantics).
  */
class Runner(
    spark: SparkSession,
    wh: Warehouse,
    retries: Int = 2,                               // idr_load.py:55
    retryDelayMs: Long = 0,                         // 3 min in the reference; 0 for tests
    onFailure: StageFailure => Unit = _ => ()) {    // O4 Mattermost-webhook analog

  def runStage(pipeline: String, st: Stage): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        wh.write(st.sink, st.run(spark, wh))
        done = true
      } catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > retries) {
            onFailure(StageFailure(pipeline, st.name, e))
            throw e
          }
          if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
      }
    }
  }

  def run(p: Pipeline): Unit = p.stages.foreach(runStage(p.name, _))

  /** Topological run honoring `dependsOn` (covid/hts/mmd after load, vls
    * after mmd — README.md:74). Independent pipelines could run as parallel
    * groups (O6); sequential here keeps local-mode resource use sane while
    * preserving the ordering contract.
    */
  def runAll(pipelines: Seq[Pipeline]): Unit = {
    val byName = pipelines.map(p => p.name -> p).toMap
    val done = scala.collection.mutable.Set[String]()
    def visit(p: Pipeline, chain: List[String]): Unit = {
      if (chain.contains(p.name))
        throw new IllegalArgumentException(s"dependency cycle: ${(p.name :: chain).reverse.mkString(" -> ")}")
      if (!done(p.name)) {
        p.dependsOn.flatMap(byName.get).foreach(visit(_, p.name :: chain))
        run(p)
        done += p.name
      }
    }
    pipelines.foreach(visit(_, Nil))
  }
}
