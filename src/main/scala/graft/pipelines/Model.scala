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
    run: (SparkSession, Warehouse) => DataFrame,
    // optional inline QA metrics (aggregate expressions over the stage
    // output, e.g. sum(key.isNull) null-counts) — collected by `observe`
    // DURING the write pass, costing zero extra jobs. Observed metrics
    // forbid DISTINCT aggregates (Spark INVALID_OBSERVED_METRICS); use
    // approx_count_distinct for cardinality QA
    qaMetrics: Seq[org.apache.spark.sql.Column] = Nil)

final case class Pipeline(
    name: String,
    stages: Seq[Stage],
    dependsOn: Seq[String] = Nil)                   // O2 ExternalTaskSensor edges

final case class StageFailure(pipeline: String, stage: String, error: Throwable)

/** S5's post-load report (rows + columns, parquet_solution.py:120-124) as a
  * per-stage metrics record, extended with any stage-declared QA metrics
  * (null-key counts, domain violations, …).
  */
final case class StageMetrics(pipeline: String, stage: String, sink: String,
                              nRows: Long, nCols: Int,
                              qa: Map[String, Any])

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
    onFailure: StageFailure => Unit = _ => (),      // O4 Mattermost-webhook analog
    onMetrics: StageMetrics => Unit = _ => ()) {    // S5 rows/cols report analog

  def runStage(pipeline: String, st: Stage): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        val out = st.run(spark, wh)
        // S5's rows/cols report, but measured DURING the write pass via
        // `observe` — the reference pays a separate count job
        // (parquet_solution.py:120-121); observation metrics ride the
        // write's own action, an O(0) extra cost that still holds at 100 TB
        val obs = org.apache.spark.sql.Observation()
        val metrics =
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("__n_rows") +: st.qaMetrics
        wh.write(st.sink, out.observe(obs, metrics.head, metrics.tail: _*))
        val got = obs.get
        onMetrics(StageMetrics(pipeline, st.name, st.sink,
          got("__n_rows").asInstanceOf[Long], out.schema.length, got - "__n_rows"))
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
    * after mmd — README.md:74).
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

  /** O6 — parallel groups: pipelines whose dependencies are satisfied run
    * concurrently (the reference's `load_MMD >> [VLS, HTS, COVID]` fan-out,
    * idr_load.py:129-130). Spark's scheduler interleaves the concurrent jobs;
    * on a cluster this overlaps stages with unused executor capacity.
    */
  def runAllParallel(pipelines: Seq[Pipeline]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val names = pipelines.map(_.name).toSet
    // cycle check up front (reuses the sequential visitor's validation)
    locally {
      val byName = pipelines.map(p => p.name -> p).toMap
      val seen = scala.collection.mutable.Set[String]()
      def chk(p: Pipeline, chain: List[String]): Unit = {
        if (chain.contains(p.name))
          throw new IllegalArgumentException(s"dependency cycle: ${(p.name :: chain).reverse.mkString(" -> ")}")
        if (!seen(p.name)) { p.dependsOn.flatMap(byName.get).foreach(chk(_, p.name :: chain)); seen += p.name }
      }
      pipelines.foreach(chk(_, Nil))
    }
    val futures = scala.collection.mutable.Map[String, Future[Unit]]()
    def futureFor(p: Pipeline): Future[Unit] = futures.getOrElseUpdate(p.name, {
      val deps = p.dependsOn.filter(names.contains)
        .map(d => futureFor(pipelines.find(_.name == d).get))
      Future.sequence(deps).map(_ => run(p))
    })
    Await.result(Future.sequence(pipelines.map(futureFor)), Duration.Inf)
  }
}

/** O4/F9 — failure-alert message composition (the reference posts
  * `{dag, task, log_url}` to a Mattermost webhook, idr_load.py:28-35; the
  * transport is the caller's concern, the message shape is this).
  */
object Alerts {
  def format(f: StageFailure): String =
    s"pipeline=${f.pipeline} task=${f.stage} failed: ${f.error.getMessage}"
}
