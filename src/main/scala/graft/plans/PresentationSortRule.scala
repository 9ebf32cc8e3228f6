package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Command, Deduplicate, Distinct, Except, Intersect, Join, LogicalPlan, Repartition, RepartitionOperation, Sort, Window}
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
  *  - a child that already contains a shuffle stage (join, aggregate,
  *    window, set-op, repartition) rewrites UNCONDITIONALLY: the range
  *    partitioner's sampling pass would re-execute the post-shuffle
  *    stage anyway (earlier stages are reused through the shuffle), and
  *    join-inflated `sizeInBytes` estimates are BigInt products that
  *    blow past any byte threshold — exactly the queries where the
  *    rewrite matters most (measured: q33 2.49 s → sub-second once the
  *    stats guard stopped declining it);
  *  - an exchange-free child (pure scan→compute pipeline) rewrites only
  *    when its estimated size is under
  *    `spark.graft.presentationSort.maxBytes` (default 256 MB) — a
  *    100 TB scan result keeps its parallel range sort; scan-stats are
  *    honest (no join inflation), so the byte guard is reliable exactly
  *    where it is needed.
  */
case class PresentationSortRule() extends Rule[LogicalPlan] {

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

  /** True when executing `p` already involves a shuffle boundary. These
    * logical nodes all plan to an Exchange (or are one): the final rows
    * the gather collects are then a post-shuffle stage's output, already
    * reduced by the aggregation/join itself.
    */
  private def hasShuffleStage(p: LogicalPlan): Boolean = p.exists {
    case _: Join | _: Aggregate | _: Window | _: Distinct | _: Deduplicate |
        _: Except | _: Intersect | _: RepartitionOperation => true
    case _ => false
  }

  private def rewrite(s: Sort): LogicalPlan = {
    val small = maxBytes match {
      case None => true
      case Some(m) =>
        hasShuffleStage(s.child) ||
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
