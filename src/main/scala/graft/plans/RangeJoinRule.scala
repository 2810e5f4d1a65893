package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** RANGE-JOIN OPTIMIZER RULE — the Catalyst-native form of
  * [[graft.ops.Temporal.binnedIntervalJoin]]: a `Rule[LogicalPlan]` that
  * detects an inner join whose only cross-side predicates are a BAND
  * (`lo <= p AND p <= hi`, any mix of strict/non-strict, written in either
  * direction) and rewrites it into a binned EQUI-join, so the query a user
  * writes as a plain theta-join
  *
  * {{{ points.join(intervals, $"sd" <= $"pd" && $"pd" <= $"ed") }}}
  *
  * stops planning as a BroadcastNestedLoopJoin (the O(n·m) shape Spark
  * falls back to when no equality conjunct exists) and plans as a
  * SortMergeJoin on a derived bin id with the original band kept as the
  * join residual. Same rows by construction: bin equality is implied by
  * `lo <= p <= hi` whenever `floorDiv` buckets both endpoints of every
  * true match's containing bin — each interval explodes to EVERY bin it
  * overlaps, the point maps to its one bin, so a true match always agrees
  * on some exploded bin; false bin-mates are removed by the residual.
  *
  * This is the public Databricks/Photon "range join optimization with a
  * bin size" idea (their `RANGE_JOIN` hint) re-expressed as a standard
  * `SparkSessionExtensions` optimizer injection. The bin width comes from
  * the session conf [[RangeJoinRule.BinWidthConf]] — width ≈ the typical
  * interval length keeps interval expansion ≈ 2 rows; the rule is OFF
  * (no-op) when the conf is unset, exactly like the hint-gated original,
  * because a good width is data knowledge the optimizer cannot infer.
  *
  * Applicability guards (each one a correctness or don't-pessimize
  * condition):
  *   - inner join only — the residual-filter trick silently drops
  *     unmatched-side rows under outer semantics;
  *   - NO existing cross-side equality conjunct — if one exists Spark
  *     already plans a hash/merge join and the band rides as residual;
  *     this also makes the rule idempotent (the rewrite introduces a bin
  *     equality, so the guard refuses the second pass);
  *   - `p`, `lo`, `hi` integral (byte/short/int/long) and deterministic —
  *     bin arithmetic on longs is exact; dates/timestamps convert to epoch
  *     days/micros upstream (same contract as `binnedIntervalJoin`);
  *   - every OTHER conjunct must be single-sided (pushable) — a second
  *     cross-side theta predicate means the join is not "a band join" and
  *     rewriting could still leave a nested loop underneath.
  *
  * Scale: the rewritten plan shuffles both sides on the bin id — ordinary
  * equi-join machinery (AQE skew split, broadcast-if-small, partition
  * coalescing) all apply. Interval rows grow by `len/width + 1`; points
  * never duplicate.
  *
  * Wire-up: declaratively for every session via
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions`, or on a
  * live session via `spark.experimental.extraOptimizations`
  * (see [[graft.plans.RangeJoinRule.install]]).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Positive long bin width; unset/empty disables the rule. */
  val BinWidthConf = "spark.graft.rangeJoin.binWidth"

  private val integral = Seq(ByteType, ShortType, IntegerType, LongType)

  /** Idempotently activate the rule on a live session (the imperative
    * alternative to the `spark.sql.extensions` deployment). */
  def install(spark: org.apache.spark.sql.SparkSession, binWidth: Long): Unit = {
    spark.conf.set(BinWidthConf, binWidth.toString)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinRule))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRule
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(BinWidthConf, "")
    if (widthStr.isEmpty) return plan
    val width = widthStr.toLong
    if (width <= 0) return plan
    rewritePlan(plan, width)
  }

  /** The band→bin rewrite at an EXPLICIT width, independent of the conf
    * gate — the entry point [[graft.ops.Temporal.binnedIntervalJoin]] uses
    * to route its operator form through this one implementation (applied
    * eagerly to its own plan; no session conf, no extraOptimizations
    * mutation). Unmatched joins pass through untouched. */
  def rewritePlan(plan: LogicalPlan, width: Long): LogicalPlan = {
    require(width > 0, s"RangeJoinRule.rewritePlan: width=$width")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, width).getOrElse(j)
    }
  }

  /** Normalize a comparison into `small <= large` orientation (strictness
    * is preserved in the untouched residual, not here — bins only need the
    * non-strict hull). */
  private def asBound(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      width: Long): Option[LogicalPlan] = {
    // side classification: Some(true)=refs only left, Some(false)=only right
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(c: Expression): Boolean =
      c.references.intersect(left.outputSet).nonEmpty &&
        c.references.intersect(right.outputSet).nonEmpty
    val (cross, single) = conjuncts.partition(crossSide)
    // an existing cross-side equality already equi-plans; don't touch
    val hasEqui = cross.exists {
      case EqualTo(a, b) => sideOf(a).isDefined && sideOf(b).isDefined
      case EqualNullSafe(a, b) => sideOf(a).isDefined && sideOf(b).isDefined
      case _ => false
    }
    if (hasEqui) return None

    // the band must be EXACTLY the cross-side condition: two comparison
    // conjuncts (see scaladoc — a 3rd cross predicate means not-a-band)
    if (cross.size != 2) return None
    val bounds = cross.flatMap(asBound)
    if (bounds.size != 2) return None

    def eligible(e: Expression): Boolean =
      e.deterministic && integral.contains(e.dataType) && sideOf(e).isDefined

    // find (lo <= p, p <= hi) with p one side, lo & hi the other: the two
    // normalized conjuncts in either order
    val band = Seq(bounds, bounds.reverse).iterator.flatMap {
      case Seq((lo, p1), (p2, hi)) =>
        for {
          _ <- Option.when(p1.semanticEquals(p2))(())
          _ <- Option.when(eligible(p1) && eligible(lo) && eligible(hi))(())
          pSide <- sideOf(p1)
          if sideOf(lo).contains(!pSide) && sideOf(hi).contains(!pSide)
        } yield (p1, lo, hi, pSide)
      case _ => None
    }.take(1).toSeq.headOption
    band.map { case (p, lo, hi, pointOnLeft) =>
      build(j, left, right, cond, hint, width, p, lo, hi, pointOnLeft)
    }
  }

  private def build(j: Join, left: LogicalPlan, right: LogicalPlan,
                    cond: Expression, hint: JoinHint, width: Long,
                    p: Expression, lo: Expression, hi: Expression,
                    pointOnLeft: Boolean): LogicalPlan = {
    val w = Literal(width, LongType)
    // floor(x / w) for any-sign x: subtract the (always non-negative) pmod
    // first, then the division is exact and truncation == floor
    def floorDiv(e: Expression): Expression = {
      val el = Cast(e, LongType)
      IntegralDivide(Subtract(el, Pmod(el, w)), w)
    }

    val (ptPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)

    // interval side: explode every overlapped bin (Generate == explode()).
    // Sequence is TimeZoneAwareExpression — without an explicit zone it
    // reports unresolved and the optimizer's plan validator rejects the
    // rewrite (the zone is irrelevant for long sequences but mandatory).
    val gen = Explode(
      new Sequence(floorDiv(lo), floorDiv(hi)).withTimeZone(conf.sessionLocalTimeZone))
    val ivBin = AttributeReference("__graft_bin_iv",
      LongType, nullable = gen.elementSchema.head.nullable)()
    val ivExploded = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ivBin), child = ivPlan)

    // point side: its single bin
    val ptAlias = Alias(floorDiv(p), "__graft_bin_pt")()
    val ptProjected = Project(ptPlan.output :+ ptAlias, ptPlan)
    val ptBin = ptAlias.toAttribute

    val (newLeft, newRight) =
      if (pointOnLeft) (ptProjected, ivExploded) else (ivExploded, ptProjected)
    // bin equality makes it an equi-join; the FULL original condition rides
    // as residual (re-checking bounds exactly, including strictness)
    val newJoin = Join(newLeft, newRight, Inner,
      Some(And(EqualTo(ptBin, ivBin), cond)), hint)
    Project(j.output, newJoin) // restore the original output (drop bins)
  }
}
