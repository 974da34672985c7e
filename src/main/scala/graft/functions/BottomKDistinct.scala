package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k DISTINCT strings as a typed `Aggregator` UDAF — the sketch
  * primitive behind `t5_fingerprint` (SURVEY.md §2.10): keeps the k
  * smallest distinct values per group with partial aggregation, so each
  * map task forwards ≤ k values per group into the shuffle instead of the
  * group's full distinct set (`collect_set` hauls every distinct gram —
  * hundreds per document — through the wire and materializes it in the
  * agg buffer; this buffer is bounded at k). Values are fixed-width hex,
  * so lexicographic order == numeric order. Insert is O(k) per row with
  * an early reject once the buffer is full.
  */
class BottomKDistinct(k: Int) extends Aggregator[String, List[String], Seq[String]] {

  override def zero: List[String] = Nil

  override def reduce(buf: List[String], s: String): List[String] =
    if (s == null) buf
    // full and s can't displace the current max (== max is a duplicate)
    else if (buf.lengthCompare(k) >= 0 && s >= buf.last) buf
    else if (buf.contains(s)) buf
    else {
      val m = (s :: buf).sorted
      if (m.lengthCompare(k) > 0) m.take(k) else m
    }

  override def merge(a: List[String], b: List[String]): List[String] = {
    val m = (a ++ b).distinct.sorted
    if (m.lengthCompare(k) > 0) m.take(k) else m
  }

  override def finish(buf: List[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
