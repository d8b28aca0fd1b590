package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.engine.Btrdb

/** Catalyst rewrite: stat-shaped aggregates over a registered engine
  * point view are served from the rollup pyramid instead of the point
  * log — the optimizer-integrated form of the planner-function
  * substitution `alignedWindows` does inside the engine API (SURVEY
  * §4.1 "aggregate pushdown / materialized rollups", §7.3 "optional
  * `Rule[LogicalPlan]` later"; the reference's analog is the tree walk
  * stopping at pre-aggregated core nodes without touching leaves,
  * /root/reference/qtree/qtree.go:894-942).
  *
  * A SQL user writes the natural query over the view
  * [[graft.engine.Btrdb.registerViews]] creates:
  *
  * {{{
  *   SELECT shiftleft(shiftright(time, 42), 42) AS w,
  *          count(*) AS cnt, min(value), avg(value), max(value)
  *   FROM graft_points
  *   WHERE sid = 3 AND time >= :aligned_lo AND time < :aligned_hi
  *   GROUP BY 1
  * }}}
  *
  * and the rule swaps the point-log scan for the coarsest maintained
  * pyramid level ≤ the requested pointwidth, combining partials exactly
  * ((Σcnt, min, Σsum, max); mean = Σsum/Σcnt — the same merge contract
  * as /root/reference/merger.go:126-208). At 100 TB the difference is a
  * partition-pruned scan of rollup rows (data/2^level) vs the raw log.
  *
  * The rewrite fires only when it is EXACTLY equivalent:
  *   - grouping is the canonical clamp `shiftleft(shiftright(time, pw),
  *     pw)` (optionally plus `sid`) with pw ≥ the finest pyramid level;
  *   - aggregates are count/min/max/avg/sum over `value` (no DISTINCT,
  *     no FILTER clauses);
  *   - WHERE is a conjunction of `sid = k` / `sid IN (...)` and time
  *     bounds in any equivalent spelling (`>=`, `>`, `<`, `<=`,
  *     BETWEEN, literal on either side) that NORMALIZE to 2^pw-ALIGNED
  *     `[lo, hi)` — an unaligned bound would make boundary buckets
  *     over-count, so it bails;
  *   - the engine confirms the affected streams are clean: pyramid
  *     level present, no staged (minor-version) points, no un-compacted
  *     delete debt, no tombstoned stream awaiting purge;
  *   - avg/sum additionally require every affected stream's values to
  *     lie on the 2-decimal cents grid (tracked per insert commit) —
  *     the pyramid serves them from exact integer cents sums, which for
  *     off-grid doubles would differ from the IEEE plan by up to
  *     0.005/point. Anything else falls through to the merge-on-read
  *     point-log plan unchanged.
  *
  * Registered per-session via [[graft.functions.GraftExtensions]]
  * (post-hoc resolution — the view's `SubqueryAlias` marker is still
  * present there; the optimizer erases it in its first batch).
  */
object PyramidSubstitution {

  /** view name (lowercase) → (owning session, member engines). A
    * single-engine view registers one member; a federated union view
    * ([[graft.engine.Federation.registerViews]]) registers every
    * member, and the rule splices a union of per-member pyramid
    * partials. One registration per view name per JVM; the session is
    * identity-checked at match time. */
  private val registry =
    new ConcurrentHashMap[String, (SparkSession, Seq[Btrdb])]()

  def register(spark: SparkSession, viewName: String, engine: Btrdb): Unit =
    registry.put(viewName.toLowerCase, (spark, Seq(engine)))

  /** Register a federated union view: stat queries over it are served
    * from EVERY member's pyramid (combined exactly), or none — one
    * member that cannot serve (staged points, delete debt, off-grid
    * values for avg/sum) bails the whole rewrite to merge-on-read. */
  def registerFederation(spark: SparkSession, viewName: String,
                         engines: Seq[Btrdb]): Unit =
    registry.put(viewName.toLowerCase, (spark, engines))

  def unregister(viewName: String): Unit =
    registry.remove(viewName.toLowerCase)

  private[plans] def lookup(session: SparkSession,
                            viewName: String): Option[Seq[Btrdb]] =
    Option(registry.get(viewName.toLowerCase))
      .collect { case (s, e) if s eq session => e }
}

final class PyramidSubstitutionRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        tryRewrite(agg).getOrElse(agg)
    }

  /** The matched query, destructured. */
  private case class Shape(sidAttr: Attribute,
      timeAttr: Attribute, valueAttr: Attribute, pw: Int,
      clampExpr: Expression, bySid: Boolean, sids: Option[Seq[Long]],
      lo: Option[Long], hi: Option[Long])

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      (view, conds) <- peel(agg.child, Nil)
      engines <- PyramidSubstitution.lookup(session, view.alias)
      shape <- matchShape(view.output, conds, agg)
      // avg/sum are served from the exact integer cents sums, which is
      // only equivalent for streams whose every value lies on the cents
      // grid — the engine bails otherwise (count/min/max need no such
      // guarantee)
      needExactSum = agg.aggregateExpressions.exists(ne =>
        classify(ne, shape).exists(c => c == "vmean" || c == "vsum"))
      // one filtered partial slice per federation member (a plain view
      // registers exactly one member); EVERY member must be serveable
      // from its pyramid or the whole rewrite bails — a partial
      // substitution would double-count nothing but could mix exact
      // cents sums with IEEE sums across members
      partials <- engines.foldLeft(Option(Seq.empty[org.apache.spark.sql
          .DataFrame])) { (acc, e) =>
        acc.flatMap(ps => e.pyramidPartialsFor(
          shape.sids, shape.lo, shape.hi, shape.pw, needExactSum)
          .map(ps :+ _))
      }
      frame = Btrdb.combinePyramidPartials(
        partials.reduce(_ unionByName _), shape.bySid)
    } yield splice(agg, shape, frame.queryExecution.analyzed)

  /** Strip Filter/View layers down to the view's SubqueryAlias marker,
    * collecting filter conjuncts on the way. */
  @annotation.tailrec
  private def peel(p: LogicalPlan, conds: Seq[Expression])
      : Option[(SubqueryAlias, Seq[Expression])] = p match {
    case Filter(cond, child) =>
      peel(child, conds ++ splitConjunctivePredicates(cond))
    case s: SubqueryAlias => Some((s, conds))
    case v: View => peel(v.child, conds)
    case _ => None
  }

  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Int, _) => Some(v.toLong)
      // analysis-time type coercion widens int literals via Cast; the
      // optimizer would fold it, but this rule runs before that
      case c: Cast if c.dataType == org.apache.spark.sql.types.LongType =>
        unapply(c.child)
      case _ => None
    }
  }

  /** The canonical clamp `shiftleft(shiftright(t, pw), pw)`. */
  private def clampPw(e: Expression, timeAttr: Attribute): Option[Int] =
    trimAliases(e) match {
      case ShiftLeft(ShiftRight(t: Attribute, LongLit(a)), LongLit(b))
          if a == b && t.semanticEquals(timeAttr) => Some(a.toInt)
      case _ => None
    }

  private def matchShape(viewOut: Seq[Attribute],
      conds: Seq[Expression], agg: Aggregate): Option[Shape] = {
    def attr(name: String) = viewOut.find(_.name.equalsIgnoreCase(name))
    (attr("sid"), attr("time"), attr("value")) match {
      case (Some(sidA), Some(timeA), Some(valueA)) =>
        // ---- filters: sid pins and 2^pw-aligned time bounds only ----
        // Every equivalent spelling of a half-open bound normalizes to
        // [lo, hi): `>=`/`>`/`<`/`<=` with the literal on either side
        // (BETWEEN arrives parser-lowered to `>= AND <=`). Repeated
        // bounds TIGHTEN (max of lows, min of highs) and repeated sid
        // pins intersect — dropping one conjunct would widen the scan
        // past what the original plan filters.
        var sids: Option[Seq[Long]] = None
        var lo: Option[Long] = None
        var hi: Option[Long] = None
        def pinSids(vs: Seq[Long]): Boolean = {
          sids = Some(sids.fold(vs)(_.intersect(vs))); true
        }
        def low(v: Long): Boolean = { lo = Some(lo.fold(v)(math.max(_, v))); true }
        def high(v: Long): Boolean = { hi = Some(hi.fold(v)(math.min(_, v))); true }
        // exclusive→half-open normalization needs v+1; at Long.MaxValue
        // that wraps to MinValue (`time <= MaxValue` would substitute an
        // EMPTY plan for an unbounded query) — bail instead, the raw
        // plan already answers the degenerate bound correctly
        def lowX(v: Long): Boolean = v != Long.MaxValue && low(v + 1)
        def highX(v: Long): Boolean = v != Long.MaxValue && high(v + 1)
        val condsOk = conds.forall {
          case EqualTo(a: Attribute, LongLit(v)) if a.semanticEquals(sidA) =>
            pinSids(Seq(v))
          case EqualTo(LongLit(v), a: Attribute) if a.semanticEquals(sidA) =>
            pinSids(Seq(v))
          case In(a: Attribute, vs) if a.semanticEquals(sidA) &&
              vs.forall(LongLit.unapply(_).isDefined) =>
            pinSids(vs.map(LongLit.unapply(_).get))
          case GreaterThanOrEqual(a: Attribute, LongLit(v))
              if a.semanticEquals(timeA) => low(v)            // time >= v
          case GreaterThan(a: Attribute, LongLit(v))
              if a.semanticEquals(timeA) => lowX(v)           // time > v
          case LessThan(a: Attribute, LongLit(v))
              if a.semanticEquals(timeA) => high(v)           // time < v
          case LessThanOrEqual(a: Attribute, LongLit(v))
              if a.semanticEquals(timeA) => highX(v)          // time <= v
          case LessThanOrEqual(LongLit(v), a: Attribute)
              if a.semanticEquals(timeA) => low(v)            // v <= time
          case LessThan(LongLit(v), a: Attribute)
              if a.semanticEquals(timeA) => lowX(v)           // v < time
          case GreaterThan(LongLit(v), a: Attribute)
              if a.semanticEquals(timeA) => high(v)           // v > time
          case GreaterThanOrEqual(LongLit(v), a: Attribute)
              if a.semanticEquals(timeA) => highX(v)          // v >= time
          // BETWEEN survives analysis as a RuntimeReplaceable that only
          // lowers to >=/<= in the optimizer — after this rule runs
          case b: Between => (b.input, b.lower, b.upper) match {
            case (a: Attribute, LongLit(l), LongLit(u))
                if a.semanticEquals(timeA) => low(l) && highX(u)
            case _ => false
          }
          case _ => false
        }
        // ---- grouping: clamp(time, pw) with optional sid ----
        val groups = agg.groupingExpressions.map(trimAliases)
        val clampGroups = groups.flatMap(g => clampPw(g, timeA).map(g -> _))
        val sidGrouped = groups.exists {
          case a: Attribute => a.semanticEquals(sidA)
          case _ => false
        }
        val shapeOk = condsOk && clampGroups.size == 1 &&
          groups.size == clampGroups.size + (if (sidGrouped) 1 else 0)
        if (!shapeOk) None
        else {
          val (clampExpr, pw) = clampGroups.head
          val aligned = Seq(lo, hi).flatten.forall(t => ((t >> pw) << pw) == t)
          val aggsOk = agg.aggregateExpressions.forall(ne =>
            classify(ne, Shape(sidA, timeA, valueA, pw, clampExpr,
              sidGrouped, sids, lo, hi)).isDefined)
          if (aligned && aggsOk)
            Some(Shape(sidA, timeA, valueA, pw, clampExpr,
              sidGrouped, sids, lo, hi))
          else None
        }
      case _ => None
    }
  }

  /** Map one output expression of the matched Aggregate to the column
    * name it reads from the pyramid combine frame. */
  private def classify(ne: NamedExpression, s: Shape): Option[String] = {
    val e = trimAliases(ne)
    e match {
      case ae: AggregateExpression
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count if c.children.forall {
              case _: Literal => true
              // count(col) on the view's never-null columns ≡ count(*)
              case a: Attribute => a.semanticEquals(s.sidAttr) ||
                a.semanticEquals(s.timeAttr) || a.semanticEquals(s.valueAttr)
              case _ => false
            } => Some("cnt")
          case m: Min if m.child.semanticEquals(s.valueAttr) => Some("vmin")
          case m: Max if m.child.semanticEquals(s.valueAttr) => Some("vmax")
          case a: Average if a.child.semanticEquals(s.valueAttr) => Some("vmean")
          case sm: Sum if sm.child.semanticEquals(s.valueAttr) => Some("vsum")
          case _ => None
        }
      case g if g.semanticEquals(s.clampExpr) => Some("wstart")
      case a: Attribute if s.bySid && a.semanticEquals(s.sidAttr) => Some("sid")
      case _ => None
    }
  }

  /** Replace the Aggregate with the pyramid combine plan, re-aliasing
    * its columns onto the original output attributes' exprIds so every
    * parent operator resolves unchanged. */
  private def splice(agg: Aggregate, shape: Shape,
                     rep: LogicalPlan): LogicalPlan = {
    val byName = rep.output.map(a => a.name -> a).toMap
    val projections = agg.aggregateExpressions.map { ne =>
      val target = byName(classify(ne, shape).get)
      Alias(target, ne.name)(exprId = ne.exprId)
    }
    Project(projections, rep)
  }
}
