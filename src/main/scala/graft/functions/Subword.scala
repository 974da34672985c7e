package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword tokenizer — the BPE/wordpiece-class metering
  * the t-family's token budgets need (whitespace counts misprice
  * budgets by ~1.3–1.5× on English and worse on code; the r13 verdict's
  * #4). GREEDY LONGEST-MATCH over a LITERAL vocab table: the text is
  * split on whitespace runs, and within each word the tokenizer
  * repeatedly emits the longest vocab entry that prefixes the remaining
  * suffix, falling back to a single character when nothing matches (the
  * byte-fallback posture, so tokenization is total — no `<unk>`). No
  * merge ranks, no learned state, no RNG: the token sequence is a pure
  * function of (text, vocab), which is what lets DuckDB replay the
  * exact same greedy walk as a recursive CTE and the t35/t36 registry
  * entries carry FULL oracles.
  *
  * Scale shape: a codegen'd scan-side expression (the [[Sha256Chunks]]
  * pattern) — token metering is THE hot path of the t-family, so this
  * must not fall out of whole-stage codegen or into a Scala UDF. The
  * vocab ships with the plan via `ctx.addReferenceObj` (NOT a
  * static registry keyed at driver time — generated code is compiled
  * per executor, so instance state must ride the serialized plan; the
  * [[VectorExpressions]] PQ table precedent). Matching cost per word is
  * O(len · |bucket|) with entries bucketed by first char and tried
  * longest-first.
  */
class SubwordTable(val vocab: Array[String]) extends Serializable {

  require(vocab.nonEmpty && vocab.forall(_.nonEmpty), "vocab entries must be non-empty")

  /** Entries bucketed by first char, longest first — rebuilt lazily on
    * each executor after deserialization.
    */
  @transient private lazy val byFirst: java.util.HashMap[Character, Array[String]] = {
    val m = new java.util.HashMap[Character, Array[String]]()
    vocab.distinct.groupBy(_.charAt(0)).foreach { case (c, vs) =>
      m.put(c, vs.sortBy(v => (-v.length, v)))
    }
    m
  }

  /** Greedy longest-match token count of one whitespace-split text. */
  def count(s: UTF8String): Long = walk(s.toString, null)

  /** The token strings themselves (spec/debug surface; metering uses
    * [[count]] so the hot path never materializes the array).
    */
  def tokens(s: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    walk(s.toString, out)
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  private def walk(str: String, out: java.util.ArrayList[UTF8String]): Long = {
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      if (Character.isWhitespace(str.charAt(i))) { i += 1 }
      else {
        // word extent [i, we)
        var we = i
        while (we < len && !Character.isWhitespace(str.charAt(we))) we += 1
        var p = i
        while (p < we) {
          var tokLen = 1
          val cands = byFirst.get(str.charAt(p))
          if (cands != null) {
            var k = 0
            var found = false
            while (!found && k < cands.length) {
              val v = cands(k)
              // candidates are longest-first: first prefix hit IS the
              // greedy longest match (and must not cross the word end)
              if (v.length <= we - p && str.startsWith(v, p)) {
                tokLen = v.length; found = true
              }
              k += 1
            }
          }
          if (out != null) out.add(UTF8String.fromString(str.substring(p, p + tokLen)))
          n += 1L
          p += tokLen
        }
        i = we
      }
    }
    n
  }
}

/** `subword_count(text)` — greedy-longest-match token count over the
  * table's vocab; LONG, codegen'd.
  */
case class SubwordCount(child: Expression, table: SubwordTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(s: Any): Any = table.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("subwordTable", table, classOf[SubwordTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `subword_tokens(text)` — the token strings (array<string>). */
case class SubwordTokens(child: Expression, table: SubwordTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_tokens"

  override def nullSafeEval(s: Any): Any = table.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("subwordTable", table, classOf[SubwordTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.tokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Subword {

  /** Column API: greedy subword token count of `c` under `vocab`. */
  def count(c: Column, vocab: Seq[String]): Column =
    Shim.column(SubwordCount(Shim.expression(c), new SubwordTable(vocab.toArray)))

  /** Column API: the greedy subword tokens of `c` under `vocab`. */
  def tokens(c: Column, vocab: Seq[String]): Column =
    Shim.column(SubwordTokens(Shim.expression(c), new SubwordTable(vocab.toArray)))
}

/** LEARNED-merge BPE application — the true-BPE counterpart of
  * [[SubwordTable]]'s longest-match fixture: each word is seeded as its
  * character sequence and the merge table is applied IN RANK ORDER, one
  * single left-to-right greedy pass per merge (merge rank k rewrites
  * every non-overlapping (a, b) adjacency leftmost-first — the textbook
  * BPE apply; a priority-queue per-word apply would be faster but this
  * rank-ordered pass set is the form DuckDB replays verbatim via
  * chained `list_reduce` rounds, which is what buys the t38 FULL
  * oracle). Cost is O(K · len) per word; the merge table is a
  * parameter-bounded model artifact (K merges), shipped with the plan
  * via addReferenceObj like the fixture vocab.
  */
class BpeTable(val merges: Array[(String, String)]) extends Serializable {

  def count(s: UTF8String): Long = walkText(s.toString, null)

  def tokens(s: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    walkText(s.toString, out)
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  private def walkText(str: String, out: java.util.ArrayList[UTF8String]): Long = {
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      if (Character.isWhitespace(str.charAt(i))) { i += 1 }
      else {
        var we = i
        while (we < len && !Character.isWhitespace(str.charAt(we))) we += 1
        n += word(str.substring(i, we), out)
        i = we
      }
    }
    n
  }

  /** Apply every merge in rank order to one word; returns its token
    * count (and appends tokens when `out` is non-null).
    */
  def word(w: String, out: java.util.ArrayList[UTF8String]): Long = {
    var syms = new java.util.ArrayList[String](w.length)
    var c = 0
    while (c < w.length) { syms.add(String.valueOf(w.charAt(c))); c += 1 }
    var k = 0
    while (k < merges.length) {
      val (a, b) = merges(k)
      // one greedy left-to-right pass: a merged token never re-matches
      // as the LEFT side within the same rank (textbook BPE semantics,
      // and exactly what the oracle's list_reduce computes)
      val next = new java.util.ArrayList[String](syms.size())
      var j = 0
      while (j < syms.size()) {
        val x = syms.get(j)
        if (next.size() > 0 && next.get(next.size() - 1) == a && x == b)
          next.set(next.size() - 1, a + b)
        else next.add(x)
        j += 1
      }
      syms = next
      k += 1
    }
    if (out != null) {
      var j = 0
      while (j < syms.size()) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
    }
    syms.size().toLong
  }
}

/** `bpe_count(text)` — token count under the learned merge table. */
case class BpeCount(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(s: Any): Any = table.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_tokens(text)` — the merged token strings (spec/debug surface). */
case class BpeTokens(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(s: Any): Any = table.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.tokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bpe {

  /** Column API: token count of `c` under the learned `merges`. */
  def count(c: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeCount(Shim.expression(c), new BpeTable(merges.toArray)))

  /** Column API: merged tokens of `c` under the learned `merges`. */
  def tokens(c: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeTokens(Shim.expression(c), new BpeTable(merges.toArray)))
}
