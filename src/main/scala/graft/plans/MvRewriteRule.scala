package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW AUTO-REWRITE — the classic OLAP aggregate-rollup
  * rewrite (Calcite's `MaterializedViewAggregateRule` / BigQuery "smart
  * tuning" idea) as a standard Catalyst `Rule[LogicalPlan]`: a query that
  * aggregates the BASE table,
  *
  * {{{ base.filter($"flag" =!= "R").groupBy($"status").agg(count(lit(1)), sum($"qty")) }}}
  *
  * is rewritten — without the user changing a line — to re-aggregate the
  * (much smaller) registered MV when the query is derivable from it:
  * grouping columns a subset of the MV's, filters touching only MV grouping
  * columns, and every aggregate a rollup the MV's columns can answer
  * (`count(*)` → `sum(cnt)`, `sum(x)` → `sum(sum_x)`, `min/max(x)` →
  * `min/max(min_x/max_x)`, `count(x)` → `sum(cnt_x)`). Anything else —
  * DISTINCT aggregates, FILTER clauses, filters on non-grouping columns,
  * aggregates over unregistered columns, type-growing sums (decimal) —
  * bails to the untouched plan, so the rule can never change semantics,
  * only the access path.
  *
  * At 100 TB this is the highest-leverage optimization in the file: the
  * dashboard query that scans the fact table becomes a scan of a
  * dim-cardinality rollup — metadata-sized IO instead of a full pass — and
  * the MV itself stays fresh incrementally via the versioned change feed
  * ([[graft.io.Versioned.changesWithImages]] →
  * [[graft.ops.Incremental.applyCountSumDeltas]], the q194 pipeline).
  *
  * Correctness of the rollup algebra: the MV partitions the base rows by
  * the MV grouping key, so any coarser regrouping re-combines whole
  * partitions — `count` and `sum` are re-summed (null-safe: an all-null
  * base group stores a null `sum_x`, and re-summing nulls stays null),
  * `min`/`max` re-extremed. A filter on MV grouping columns selects whole
  * partitions, never splitting one, which is exactly why filters on other
  * columns must bail. The rewrite preserves the query's output names AND
  * `exprId`s, so parents of the aggregate (sorts, joins, projects) are
  * untouched.
  *
  * The registry is driver-side JVM state ([[register]]) — the optimizer
  * only ever runs on the driver, so this is the same placement Spark's own
  * `extraOptimizations` uses. Wire up via [[install]] (live session) or
  * `spark.sql.extensions` (declarative); the rewrite is also gated on the
  * session conf [[EnabledConf]] so it can be toggled per session without
  * touching the registry.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  /** Set "false" to disable the rewrite for a session (default on). */
  val EnabledConf = "spark.graft.mv.enabled"

  /** One registered view.
    * @param basePaths  root paths of the base table's file relation — the
    *                   match key against query plans
    * @param mvPlan     analyzed leaf plan of the MV data (re-instanced per
    *                   rewrite so repeated use never collides on exprIds)
    * @param groupCols  the MV's grouping columns (base-table names; same
    *                   names in the MV)
    * @param countStar  MV column holding `count(*)`
    * @param sums/mins/maxs/counts  base column → MV rollup column
    */
  case class MvDef(name: String, basePaths: Set[String], mvPlan: LogicalPlan,
                   groupCols: Seq[String], countStar: String,
                   sums: Map[String, String], mins: Map[String, String],
                   maxs: Map[String, String], counts: Map[String, String])

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def register(d: MvDef): Unit = registry.put(d.name, d)
  def deregister(name: String): Unit = registry.remove(name)

  /** Idempotently activate the rule on a live session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(MvRewriteRule))
      spark.experimental.extraOptimizations = cur :+ MvRewriteRule
  }

  /** Build, persist, and register an MV over `base` in one step: one
    * grouped pass computes `count(*)` plus sum/min/max/count for every
    * `aggCols` column, written as parquet at `mvPath`. The base DataFrame
    * must bottom out in a single file relation (that relation's paths are
    * the rewrite's match key). Returns the registered definition. */
  def create(spark: SparkSession, name: String, base: DataFrame, mvPath: String,
             groupCols: Seq[String], aggCols: Seq[String]): MvDef = {
    import org.apache.spark.sql.functions._
    require(groupCols.nonEmpty, "an MV needs at least one grouping column")
    val aggs = count(lit(1)).as("__cnt") +: aggCols.flatMap(c => Seq(
      sum(col(c)).as(s"__sum_$c"), min(col(c)).as(s"__min_$c"),
      max(col(c)).as(s"__max_$c"), count(col(c)).as(s"__cnt_$c")))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    registerExisting(spark, name, base, mvPath, groupCols,
      countStar = "__cnt",
      sums = aggCols.map(c => c -> s"__sum_$c").toMap,
      mins = aggCols.map(c => c -> s"__min_$c").toMap,
      maxs = aggCols.map(c => c -> s"__max_$c").toMap,
      counts = aggCols.map(c => c -> s"__cnt_$c").toMap)
  }

  /** Register an EXISTING rollup dataset as the MV for `base` WITHOUT
    * recomputing it — the registration path for incrementally maintained
    * views (maintain with [[graft.ops.Incremental.applyCountSumDeltas]]
    * from the versioned change feed, then re-point the registry at the
    * refreshed data). The match key is `base`'s CURRENT file set, which is
    * also the staleness guard: when the base table evolves to a new
    * snapshot, its file set changes and the rewrite silently stops firing
    * until the MV is refreshed and re-registered against the new snapshot
    * — a stale MV can never answer a fresh query. Only the rollup columns
    * actually present need declaring; queries needing an undeclared rollup
    * bail to the base. */
  def registerExisting(spark: SparkSession, name: String, base: DataFrame,
                       mvPath: String, groupCols: Seq[String], countStar: String,
                       sums: Map[String, String] = Map.empty,
                       mins: Map[String, String] = Map.empty,
                       maxs: Map[String, String] = Map.empty,
                       counts: Map[String, String] = Map.empty): MvDef = {
    require(groupCols.nonEmpty, "an MV needs at least one grouping column")
    val paths = relationPaths(base.queryExecution.analyzed)
    require(paths.nonEmpty,
      s"MV '$name': the base plan has no file relation to match against")
    val d = MvDef(name, paths, spark.read.parquet(mvPath).queryExecution.analyzed,
      groupCols, countStar, sums, mins, maxs, counts)
    register(d)
    d
  }

  private def relationPaths(plan: LogicalPlan): Set[String] = plan.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
  }.flatten.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || conf.getConfString(EnabledConf, "true") != "true") return plan
    plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        val it = registry.values().iterator()
        var out: LogicalPlan = null
        while (out == null && it.hasNext)
          out = tryRewrite(grouping, aggExprs, child, it.next()).orNull
        if (out == null) agg else out
    }
  }

  /** Unwrap column-pruning Projects and collect Filter conjuncts down to
    * the leaf relation. Any other operator in between → not derivable. */
  private def strip(p: LogicalPlan,
                    conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case l: LogicalRelation => Some((l, conds))
      case Filter(c, ch) => strip(ch, conds :+ c)
      case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(ch, conds)
      case _ => None
    }

  private def tryRewrite(grouping: Seq[Expression], aggExprs: Seq[NamedExpression],
                         child: LogicalPlan, d: MvDef): Option[LogicalPlan] = {
    val (rel, filters) = strip(child, Nil).getOrElse(return None)
    if (relationPaths(rel) != d.basePaths) return None

    // the query's grouping must be bare base columns, each an MV group col
    val groupAttrs = grouping.map {
      case a: AttributeReference if d.groupCols.contains(a.name) => a
      case _ => return None
    }
    // filters may only touch MV grouping columns (whole-partition selects)
    if (filters.exists(_.references.exists(r => !d.groupCols.contains(r.name))))
      return None

    // fresh MV instance + name → attribute map
    val mv = d.mvPlan match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
    val mvAttr: Map[String, Attribute] = mv.output.map(a => a.name -> a).toMap
    def attr(name: String): Option[Attribute] = mvAttr.get(name)

    def sumOf(mvCol: String, zeroFill: Boolean): Option[Expression] = attr(mvCol).map { a =>
      val s = Sum(a).toAggregateExpression()
      if (zeroFill) Coalesce(Seq(s, Literal(0L, s.dataType))) else s
    }

    // rewrite one aggregate call; None → the whole query bails
    def rollup(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null => sumOf(d.countStar, zeroFill = true)
        case Count(Seq(a: AttributeReference)) =>
          d.counts.get(a.name).flatMap(sumOf(_, zeroFill = true))
        case Sum(a: AttributeReference, _) =>
          d.sums.get(a.name).flatMap(attr).flatMap { m =>
            val s = Sum(m).toAggregateExpression()
            // refuse type-growing re-sums (decimal widens per pass)
            Option.when(s.dataType == ae.dataType)(s)
          }
        case Min(a: AttributeReference) =>
          d.mins.get(a.name).flatMap(attr).map(Min(_).toAggregateExpression())
        case Max(a: AttributeReference) =>
          d.maxs.get(a.name).flatMap(attr).map(Max(_).toAggregateExpression())
        case _ => None
      }
    }

    // every output column must be a grouping attribute or a derivable
    // aggregate; names and exprIds are preserved exactly
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(attr(a.name).getOrElse(return None), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        Alias(rollup(ae).getOrElse(return None), name)(exprId = al.exprId)
      case _ => return None
    }
    val newGrouping = groupAttrs.map(a => attr(a.name).getOrElse(return None))
    val newFilters = filters.map(_.transform {
      case a: AttributeReference => attr(a.name).getOrElse(return None)
    })
    val newChild = newFilters.foldLeft(mv)((p, c) => Filter(c, p))
    Some(Aggregate(newGrouping, newAggExprs, newChild))
  }
}
