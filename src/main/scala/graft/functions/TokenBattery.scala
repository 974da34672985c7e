package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass, codegen'd form of the st8 quality-battery scan counters:
  * `token_battery(text)` returns
  * `struct(n_tok, chars, stop, mx)` — BIT-IDENTICAL (property-tested by
  * TokenBatterySpec) to the higher-order-function composition it
  * replaces:
  *
  * {{{
  *   ts    = split(trim(text), "\\s+")
  *   n_tok = size(ts)
  *   chars = aggregate(ts, 0L, (a, x) => a + length(x))
  *   stop  = size(filter(ts, t => array_contains(stopwords, t)))
  *   mx    = array_max(transform(array_distinct(ts),
  *             t => size(filter(ts, x => x === t))))
  * }}}
  *
  * Two wins, both per-row (guide §1.2 step 2 / §4.1): (1) higher-order
  * functions are CodegenFallback expressions — every token of every doc
  * paid interpreted lambda dispatch inside an otherwise codegen'd stage;
  * this is one static JVM call. (2) the `mx` term was O(n_tok · n_distinct)
  * string comparisons per document (filter-per-distinct-token) — a
  * 100k-token doc (the battery's own `ntok` bound admits them) pays
  * ~10^10 comparisons on ONE ROW at that shape; the hash-count pass here
  * is O(n_tok). Split semantics replicate Java `"\\s+"` regex split with
  * limit −1 exactly (all of `\s` is ASCII: space, \t, \n, \x0B, \f, \r —
  * in UTF-8 those bytes never occur inside a multi-byte sequence, so the
  * byte scan is equivalent on any input); leading-empty and
  * trailing-empty token behavior is pinned by the spec's property test
  * against the builtin composition.
  */
case class TokenBattery(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TokenBattery.schema

  override def prettyName: String = "token_battery"

  @transient private lazy val swSet: java.util.HashSet[UTF8String] =
    TokenBattery.buildSet(stopwords)

  override def nullSafeEval(s: Any): Any =
    TokenBattery.compute(s.asInstanceOf[UTF8String], swSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("swSet", swSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenBattery.compute($c, $swRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenBattery {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("stop", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))

  private[graft] def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // \s for a Java regex is exactly [ \t\n\x0B\f\r] — all single-byte in
  // UTF-8 and never part of a multi-byte sequence
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Static entry shared by interpreted eval and generated code.
    * Semantics: `split(trim(s), "\\s+")` (Spark trim = strip 0x20 at both
    * ends; Java split with limit −1 keeps leading/trailing empty tokens),
    * then one pass computing the four counters.
    */
  def compute(s: UTF8String, sw: java.util.HashSet[UTF8String]): InternalRow = {
    val t = s.trim()
    val bytes = t.getBytes
    val len = bytes.length
    var nTok = 0L
    var chars = 0L
    var stop = 0L
    var mx = 0L
    val counts = new java.util.HashMap[UTF8String, Long]()
    def addToken(from: Int, until: Int): Unit = {
      nTok += 1
      val tok = UTF8String.fromBytes(bytes, from, until - from)
      chars += tok.numChars()
      if (sw.contains(tok)) stop += 1
      val c = counts.merge(tok, java.lang.Long.valueOf(1L),
        (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
      if (c.longValue() > mx) mx = c.longValue()
    }
    // Java split(regex, -1): scan separator runs; token boundaries are the
    // gaps between runs. A separator run at position 0 yields a leading
    // empty token; a trailing run yields a trailing empty token; the empty
    // string yields one empty token.
    var i = 0
    var tokStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        addToken(tokStart, i)
        i += 1
        while (i < len && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    addToken(tokStart, len)
    new GenericInternalRow(Array[Any](nTok, chars, stop, mx))
  }

  /** Column API: `struct(n_tok, chars, stop, mx)` of the battery scan. */
  def battery(c: Column, stopwords: Seq[String]): Column =
    Shim.column(TokenBattery(Shim.expression(c), stopwords))
}
