package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.util.sketch.BloomFilter

/** Column API over Spark's NATIVE bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-group filters, not registered as public SQL
  * functions, lifted here through the [[Shim]] like the other custom
  * expressions). The aggregate OR-merges partial sketches, so the
  * resulting bits are partition-order INVARIANT — safe under the
  * determinism audit; the membership probe is codegen'd.
  *
  * Both sides key on an `xxhash64` LONG (the expressions' contract):
  * hash the item once, feed the same hash to build and probe.
  */
object BloomSketch {

  /** Aggregate a bloom sketch over a pre-hashed (xxhash64) LONG column,
    * sized for `expectedItems` at false-positive rate `fpp`.
    */
  def bloomAgg(hashed: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, "bloomAgg needs a positive item estimate")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    Shim.column(new BloomFilterAggregate(Shim.expression(hashed),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Membership probe: `bloomBits` is the binary sketch (foldable — a
    * literal or scalar subquery), `hashed` the xxhash64 of the probe key.
    * NO false negatives by construction; false positives at ~fpp.
    */
  def mightContain(bloomBits: Column, hashed: Column): Column =
    Shim.column(new BloomFilterMightContain(
      Shim.expression(bloomBits), Shim.expression(hashed)))
}
