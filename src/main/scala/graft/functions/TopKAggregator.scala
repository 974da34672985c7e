package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored item flowing into the top-k aggregator. */
case class Scored(vid: Long, sim: Double)

/** Bounded top-k as a typed `Aggregator` UDAF (SURVEY.md §2.10): keeps the
  * k best (sim desc, vid asc) per group with partial aggregation — each
  * map task reduces its partition to ≤ k rows BEFORE the shuffle, so a
  * per-query top-k over N candidates moves O(k·partitions) rows instead of
  * sorting N. The window-function formulation shuffles all N candidate
  * rows; this is the 100 TB form.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.vid < b.vid)

  private def insert(buf: List[Scored], s: Scored): List[Scored] = {
    val merged = (s :: buf).sortWith(better)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], s: Scored): List[Scored] = insert(buf, s)

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    val merged = (a ++ b).sortWith(better)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: List[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
