package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One event flowing into the funnel aggregator. */
case class FunnelIn(us: Long, et: String)

/** Bounded per-user funnel state: the minimum view time plus the K
  * smallest click/purchase times (with total counts for the exactness
  * check). Lists are sorted ascending and capped at K.
  */
case class FunnelState(minView: Long, clicks: List[Long], nClicks: Long,
    purchases: List[Long], nPurchases: Long)

/** The q69 view→click→purchase funnel as a typed `Aggregator` with
  * BOUNDED state (SURVEY.md §2.10, the s5 top-k pattern applied to
  * funnel analysis). The collect_list formulation materializes every
  * event of a user in one aggregation buffer — fine for human-scale
  * users, an executor OOM for one bot with 10⁸ events. This form keeps
  * per-user state ≤ 2K+3 longs BEFORE the shuffle (partial aggregation
  * trims each map task's contribution), so a degenerate key costs
  * bounded memory everywhere.
  *
  * Exactness: the funnel needs min(view), then the smallest click AFTER
  * t1, then the smallest purchase AFTER t2. Keeping the K SMALLEST
  * clicks is a mergeable sketch that answers "smallest click > t"
  * EXACTLY whenever any kept click exceeds t (every unkept click is ≥
  * max(kept) ≥ that candidate). The one undeterminable case — all K
  * kept values ≤ t with more beyond the cap — raises a loud in-query
  * error instead of guessing (the repo's raise_error gate style); it
  * takes > K same-type events all predating the reference time to
  * trigger, so K = 1000 is far outside organic behavior.
  *
  * Window arithmetic is integer microseconds (`windowUs`), identical to
  * the DuckDB oracle's epoch_us math.
  */
class FunnelAggregator(windowUs: Long, k: Int)
    extends Aggregator[FunnelIn, FunnelState, Long] {

  override def zero: FunnelState = FunnelState(Long.MaxValue, Nil, 0L, Nil, 0L)

  /** Insert into a sorted-ascending bottom-K list. O(1) reject once the
    * list is full and the value is not below its max.
    */
  private def keep(buf: List[Long], us: Long): List[Long] =
    if (buf.length < k) (us :: buf).sorted
    else if (us < buf.last) ((us :: buf).sorted: List[Long]).take(k)
    else buf

  override def reduce(s: FunnelState, e: FunnelIn): FunnelState = e.et match {
    case "view" =>
      if (e.us < s.minView) s.copy(minView = e.us) else s
    case "click" =>
      s.copy(clicks = keep(s.clicks, e.us), nClicks = s.nClicks + 1)
    case "purchase" =>
      s.copy(purchases = keep(s.purchases, e.us), nPurchases = s.nPurchases + 1)
    case _ => s // other types only establish user presence (stage 0)
  }

  override def merge(a: FunnelState, b: FunnelState): FunnelState = FunnelState(
    math.min(a.minView, b.minView),
    ((a.clicks ++ b.clicks).sorted: List[Long]).take(k),
    a.nClicks + b.nClicks,
    ((a.purchases ++ b.purchases).sorted: List[Long]).take(k),
    a.nPurchases + b.nPurchases)

  /** Smallest kept time strictly after `t`; None = provably absent;
    * throws when the sketch cannot decide (cap exceeded below `t`).
    */
  private def smallestAfter(buf: List[Long], total: Long, t: Long,
      what: String): Option[Long] =
    buf.find(_ > t) match {
      case some @ Some(_) => some
      case None if total > buf.length =>
        throw new IllegalStateException(
          s"q69 funnel undetermined: > $k $what events all precede the " +
            s"reference time for one user; raise the aggregator cap")
      case None => None
    }

  override def finish(s: FunnelState): Long = {
    if (s.minView == Long.MaxValue) return 0L
    val t1 = s.minView
    val t2 = smallestAfter(s.clicks, s.nClicks, t1, "click")
      .filter(_ <= t1 + windowUs)
    t2 match {
      case None => 1L
      case Some(c) =>
        val t3 = smallestAfter(s.purchases, s.nPurchases, c, "purchase")
          .filter(_ <= c + windowUs)
        if (t3.isDefined) 3L else 2L
    }
  }

  override def bufferEncoder: Encoder[FunnelState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
