package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions.{Alias, BinaryComparison, Cast, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Command, Deduplicate, Distinct, Except, Filter, GlobalLimit, Intersect, Join, LogicalPlan, Project, Repartition, Sort, SubqueryAlias, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Presentation-sort optimization: a GLOBAL Sort at the root of a query
  * (or directly under the write command) exists only to order the final
  * result. Spark plans it as a range exchange whose partitioner SAMPLES
  * the child — executing the whole child plan twice. For a small result,
  * gathering the finished rows into one partition and local-sorting them
  * is the same total order at a fraction of the work.
  *
  * The gather MUST be a shuffle (`Repartition(1, shuffle = true)`), not a
  * coalesce: coalesce propagates upstream through narrow dependencies, so
  * on a shuffle-free pipeline (scan → project → orderBy) it collapses the
  * ENTIRE scan and compute onto one task — measured 10–20× regressions on
  * map-only queries (q14/q20/q26 at round 2). A single-partition shuffle
  * instead runs the child fully parallel and pays one cheap exchange of
  * the final rows; with numPartitions == 1 Spark also skips the
  * round-robin sort-before-repartition, so the exchange is a plain
  * gather.
  *
  * Guard rails, because this is a session-global rule:
  *  - only the ROOT sort (or root-command child) is touched — interior
  *    global sorts keep their ordering contract for Limit/Offset above
  *    them;
  *  - a child whose top (looking through Project/Filter/alias) is a
  *    CARDINALITY-REDUCING operator — Aggregate, Distinct, Deduplicate,
  *    Except, Intersect, Limit, or a Filter over a Window (the rank-
  *    filter top-k shape) — rewrites UNCONDITIONALLY: its output is the
  *    reduced post-shuffle result, and join/agg-inflated `sizeInBytes`
  *    estimates (BigInt products past any byte threshold) must not
  *    decline it — the round-3 q33 regression;
  *  - an INNER Join carrying a constant-threshold residual (a pushed-down
  *    post-join filter, e.g. a similarity threshold merged into the join
  *    condition) is treated as reducing under the classic optimizer
  *    default-selectivity assumption — the q33/q29 near-dup shape, whose
  *    match set is sparse by construction. A join with only equi-keys
  *    (q08's FK join) or attr-vs-attr band residuals (q57/q58 range/as-of)
  *    does NOT reduce its input, so it falls through to the byte guard —
  *    which its inflated stats fail — keeping the parallel range sort: at
  *    100× scale a bare-join result is the whole fact table and a
  *    single-partition gather would serialize it (the round-4 scale
  *    hazard this distinction removes). Outer/semi joins and bare Windows
  *    never qualify: their output is at least one full input;
  *  - an exchange-free child (pure scan→compute pipeline) rewrites only
  *    when its estimated size is under
  *    `spark.graft.presentationSort.maxBytes` (default 256 MB) — a
  *    100 TB scan result keeps its parallel range sort; scan-stats are
  *    honest (no join inflation), so the byte guard is reliable exactly
  *    where it is needed.
  */
case class PresentationSortRule() extends Rule[LogicalPlan] with PredicateHelper {

  /** None = unlimited (conf "-1"). Join-inflated estimates are BigInts
    * that can exceed Long.MaxValue, so "a very large Long" cannot express
    * "always rewrite" — the sentinel can.
    */
  private def maxBytes: Option[BigInt] =
    Try(conf.getConfString("spark.graft.presentationSort.maxBytes").toLong)
      .toOption match {
      case Some(v) if v < 0 => None
      case Some(v) => Some(BigInt(v))
      case None => Some(BigInt(256L << 20))
    }

  /** True when the plan's output is cardinality-reduced relative to its
    * inputs, judged from the top of the tree looking through row-
    * preserving wrappers (Project/alias) and Filters. These are the nodes
    * whose final rows are provably (Aggregate/Distinct/set-op/Limit) or
    * by standard selectivity assumption (rank-filter, filtering join)
    * far smaller than the data scanned — safe to gather onto one
    * partition at any scale.
    */
  private def reducingTop(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Distinct | _: Deduplicate | _: Except |
        _: Intersect | _: GlobalLimit => true
    case Project(_, child) => reducingTop(child)
    case SubqueryAlias(_, child) => reducingTop(child)
    case Filter(cond, child) =>
      child match {
        // rank/row_number filter over a window: top-k per group
        case _: Window => true
        // a residual Filter above a Join (e.g. null-sensitive predicates
        // an outer join kept out of its condition) proves nothing about
        // cardinality — judge the JOIN itself, same as the bare case
        case j: Join => filteringJoin(j)
        // a constant-threshold Filter over a CACHED derived view (the
        // shared-materialized-view pattern: q31/q76 measure a threshold
        // over the persisted pair-intersection table) — the same default-
        // selectivity assumption filteringJoin applies, surfaced one
        // level up because the join now hides inside the cached plan.
        // constThreshold requires the compared side be a COMPUTED
        // measure, mirroring filteringJoin's two-sidedness: `jacc >= 0.5`
        // qualifies (the alias substitutes to inter/(na+nb-inter) when
        // the filter sits on the view), a bare-column `doc_id >= 0`
        // never does — a tautological attr-vs-constant conjunct must not
        // gather a large cached view past the byte guard
        case c if constThreshold(cond) && cachedLeaf(c) => true
        case c => reducingTop(c)
      }
    case j: Join => filteringJoin(j)
    // a cached shared view: its pre-materialization stats inherit the
    // join-inflated estimates of the plan it caches, so the byte guard
    // cannot see how small it is — judge the CACHED plan's top by the
    // same rules instead (q29 presents the persisted verified-pair view
    // directly under its root sort)
    case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      reducingTopPhysical(r.cacheBuilder.cachedPlan)
    case _ => false
  }

  /** [[reducingTop]]'s judgment applied to a PHYSICAL plan — needed for
    * InMemoryRelation, which retains only the SparkPlan it caches. Same
    * semantics: final aggregates and constant-threshold filters reduce;
    * row-preserving wrappers (project, codegen glue, exchanges) look
    * through.
    */
  private def reducingTopPhysical(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, WholeStageCodegenExec}
    p match {
      // under AQE the cached plan is wrapped in AdaptiveSparkPlanExec;
      // judge the plan it adapts
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        reducingTopPhysical(a.inputPlan)
      case pr: ProjectExec => reducingTopPhysical(pr.child)
      case w: WholeStageCodegenExec => reducingTopPhysical(w.child)
      case i: InputAdapter => reducingTopPhysical(i.child)
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        reducingTopPhysical(e.child)
      case f: FilterExec =>
        constThreshold(f.condition) || reducingTopPhysical(f.child)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _ => false
    }
  }

  /** At least one conjunct comparing a COMPUTED expression (not a bare
    * column) against a constant — the shape of a similarity/score
    * threshold over a derived measure. Bare attr-vs-constant conjuncts
    * are excluded: they carry no selectivity evidence (`doc_id >= 0`).
    */
  private def constThreshold(cond: Expression): Boolean = {
    // Type coercion wraps a bare column compared against a wider-typed
    // literal in an implicit Cast (`int_col >= 0.5` analyzes as
    // Cast(int_col) >= 0.5). A cast/aliased attribute is still a bare
    // column — judging the wrapper as "computed" would let a
    // tautological attr-vs-constant filter over a cached view qualify
    // as reducing and bypass the byte guard. Strip the row-preserving
    // wrappers before the leaf test.
    @annotation.tailrec
    def strip(e: Expression): Expression = e match {
      case c: Cast => strip(c.child)
      case a: Alias => strip(a.child)
      case _ => e
    }
    def computed(e: Expression): Boolean = {
      val s = strip(e)
      !s.foldable && s.children.nonEmpty // an Attribute/Literal is a leaf
    }
    splitConjunctivePredicates(cond).exists {
      case bc: BinaryComparison if bc.right.foldable => computed(bc.left)
      case bc: BinaryComparison if bc.left.foldable => computed(bc.right)
      case _ => false
    }
  }

  /** The child (through row-preserving wrappers) is a cached relation. */
  private def cachedLeaf(p: LogicalPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => true
    case Project(_, c) => cachedLeaf(c)
    case SubqueryAlias(_, c) => cachedLeaf(c)
    case _ => false
  }

  /** An inner join whose condition carries a THRESHOLD residual: a
    * comparison between a two-sided expression and a constant (the
    * optimizer merges any deterministic post-join filter into the
    * inner-join condition, so `cos(a,b) >= 0.35` survives here). Only
    * constant thresholds qualify: attr-vs-attr inequalities are
    * range/as-of band predicates whose match set scales with the input
    * (q57/q58), and equi-only FK joins keep full input cardinality —
    * neither may gather.
    */
  private def filteringJoin(j: Join): Boolean =
    j.joinType == Inner && j.condition.exists { c =>
      val left = j.left.outputSet
      val right = j.right.outputSet
      def twoSided(e: Expression) =
        e.references.exists(left.contains) && e.references.exists(right.contains)
      splitConjunctivePredicates(c).exists {
        case bc: BinaryComparison if bc.right.foldable => twoSided(bc.left)
        case bc: BinaryComparison if bc.left.foldable => twoSided(bc.right)
        case _ => false
      }
    }

  private def rewrite(s: Sort): LogicalPlan = {
    val small = maxBytes match {
      case None => true
      case Some(m) =>
        reducingTop(s.child) ||
          Try(s.child.stats.sizeInBytes <= m).getOrElse(false)
    }
    if (small) s.copy(global = false, child = Repartition(1, shuffle = true, s.child))
    else s
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case s: Sort if s.global => rewrite(s)
    case c: Command =>
      c.mapChildren {
        case s: Sort if s.global => rewrite(s)
        case other => other
      }
    case _ => plan
  }
}
