package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** `bloom_probe(h1, h2)` — Kirsch–Mitzenmacher k-position membership
  * probe against a driver-built bloom bit array: position `i` is
  * `(h1 + i·h2) mod m` and the row is a hit iff ALL k positions' bits
  * are set. Bit-identical to the SQL the d13 oracle replays
  * (`element_at(words, pos div 64 + 1) & shiftleft(1, pos % 64) != 0`):
  * both inputs are 60-bit non-negative sha256 chunks and k ≤ 7, so
  * `h1 + i·h2 < 2^63` — no signed overflow on either engine.
  *
  * The bit array rides a TORRENT BROADCAST, not a plan literal (r14
  * ADVICE: a `typedLit` literal serializes with the plan PER TASK — at
  * sketch sizes that blows up plan shipping long before the sketch
  * itself is the limit; a broadcast moves the words once per executor
  * and the expression carries only the handle). Generated code caches
  * `broadcast.value()` in an immutable member, so the per-row work is
  * k masked array reads inside whole-stage codegen.
  */
case class BloomProbe(left: Expression, right: Expression,
    words: Broadcast[Array[Long]], k: Int, m: Long)
    extends BinaryExpression {

  require(k >= 1 && m >= 1, s"need k >= 1 and m >= 1, got k=$k m=$m")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint) hash inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val localWords: Array[Long] = words.value

  override def nullSafeEval(h1: Any, h2: Any): Any =
    BloomProbe.test(localWords, h1.asInstanceOf[Long], h2.asInstanceOf[Long], k, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBits", words,
      "org.apache.spark.broadcast.Broadcast<long[]>")
    // addMutableState (NOT addImmutableStateIfNotExists, which returns Unit
    // in Spark 4.1.2 and whose fixed name would collide if two probes share
    // a codegen context) returns the fresh per-instance member name; the
    // init runs once per codegen object, so per-row work stays k array reads.
    val cached = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"${ev.value} = graft.functions.BloomProbe.test($cached, $h1, $h2, $k, ${m}L);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BloomProbe {

  /** Static entry shared by interpreted eval and generated code. */
  def test(words: Array[Long], h1: Long, h2: Long, k: Int, m: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if ((words((pos >> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Column API: ALL-k-bits-set membership verdict for a row's
    * (h1, h2) chunk hashes against the broadcast bit array.
    */
  def probe(h1: Column, h2: Column, words: Broadcast[Array[Long]],
      k: Int, m: Long): Column =
    Shim.column(BloomProbe(Shim.expression(h1), Shim.expression(h2), words, k, m))
}
