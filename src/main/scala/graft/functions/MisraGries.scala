package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a typed mergeable `Aggregator`
  * (SURVEY.md §2.10 north-star surface): at most `m` counters per
  * partial, merged associatively, so the sketch pass over the corpus
  * shuffles O(m · partitions) map entries instead of the full vocabulary
  * — the 100 TB front half of the two-pass exact top-k in
  * `t22_heavy_hitters` (sketch → bounded candidate set → exact recount).
  *
  * Guarantees (Misra & Gries 1982; merge bound per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): every stored count undercounts its
  * item's true frequency by at most N/(m+1) over N processed tokens, and
  * any item with true frequency > N/(m+1) is GUARANTEED present in the
  * merged sketch. The consumer uses that to certify an exact top-k: if
  * the recounted k-th frequency exceeds N/(m+1), no absent item can beat
  * it.
  *
  * Decrement steps are O(m) on an immutable map — m is a small constant
  * (64 here) and decrements amortize: each one pays for m+1 arrivals.
  */
class MisraGries(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m > 0, s"sketch size must be positive, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c)            => b.updated(t, c + 1)
      case None if b.size < m => b.updated(t, 1L)
      case None =>
        // full and t absent: decrement every counter, drop the zeros
        // (the classic MG step — t's arrival is "spent" against m others)
        b.flatMap { case (k, v) => if (v > 1) Some(k -> (v - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (summed.size <= m) summed
    else {
      // subtract the (m+1)-th largest count from everything, drop ≤ 0 —
      // keeps ≤ m counters and preserves the mergeable error bound
      val d = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
      summed.flatMap { case (k, v) => if (v > d) Some(k -> (v - d)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
