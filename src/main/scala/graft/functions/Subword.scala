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
  * [[VectorExpressions]] PQ table precedent). Matching rides a TRIE
  * (r15 — replaced the first-char bucket scan, whose per-position cost
  * was O(len·|bucket|) and degraded linearly with vocab size on any
  * shared first char): one walk from each position, bounded by
  * min(word end, longest vocab entry) — production-vocab-sized tables
  * (~50k entries) pay the same per-position cost as the 41-entry
  * fixture. SubwordScaleSpec measures a 4096-entry vocab incl. a
  * no-whitespace (CJK-shaped) fixture.
  *
  * Positions advance by CODEPOINT (r14 ADVICE): a non-BMP character
  * (emoji, astral CJK) falls back as ONE token, never a lone-surrogate
  * pair — matching DuckDB, whose substr/length/str_split count
  * codepoints, so the t35/t37/t38 oracles agree beyond the BMP too.
  * Vocab entries must be well-formed Unicode strings (no lone
  * surrogates) so every match ends on a codepoint boundary.
  */
class SubwordTable(val vocab: Array[String]) extends Serializable {

  require(vocab.nonEmpty && vocab.forall(_.nonEmpty), "vocab entries must be non-empty")

  // enforce the codepoint-boundary precondition instead of documenting it
  // (r15 ADVICE): a lone surrogate in an entry would let the trie match end
  // mid-surrogate-pair and emit invalid UTF-8 tokens silently. One-time
  // O(total vocab chars) scan at construction.
  require(vocab.forall(SubwordTable.wellFormedUtf16),
    "vocab entries must be well-formed Unicode (no unpaired surrogate " +
      "code units) — a lone surrogate would break codepoint-boundary matching")

  /** Trie node over UTF-16 code units (a match is whole codepoints
    * because entries are well-formed; walking chars just avoids
    * surrogate re-assembly on the hot path).
    */
  private final class Node {
    var term = false
    var kids: java.util.HashMap[Character, Node] = _
  }

  /** Prefix trie over the vocab — rebuilt lazily on each executor after
    * deserialization.
    */
  @transient private lazy val root: Node = {
    val r = new Node
    vocab.foreach { v =>
      var n = r
      var i = 0
      while (i < v.length) {
        if (n.kids == null) n.kids = new java.util.HashMap[Character, Node]()
        var c = n.kids.get(v.charAt(i))
        if (c == null) { c = new Node; n.kids.put(v.charAt(i), c) }
        n = c
        i += 1
      }
      n.term = true
    }
    r
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
      val cp = str.codePointAt(i)
      if (Character.isWhitespace(cp)) { i += Character.charCount(cp) }
      else {
        // word extent [i, we), scanned by codepoint
        var we = i
        var scanning = true
        while (scanning && we < len) {
          val c = str.codePointAt(we)
          if (Character.isWhitespace(c)) scanning = false
          else we += Character.charCount(c)
        }
        var p = i
        while (p < we) {
          // one trie descent from p: the deepest terminal hit before the
          // word end IS the greedy longest match
          var best = -1
          var node = root
          var q = p
          var live = true
          while (live && q < we) {
            if (node.kids == null) live = false
            else {
              val nx = node.kids.get(str.charAt(q))
              if (nx == null) live = false
              else {
                node = nx
                q += 1
                if (node.term) best = q
              }
            }
          }
          // fallback: one CODEPOINT (never a lone surrogate half)
          val tokEnd =
            if (best > p) best else p + Character.charCount(str.codePointAt(p))
          if (out != null) out.add(UTF8String.fromString(str.substring(p, tokEnd)))
          n += 1L
          p = tokEnd
        }
        i = we
      }
    }
    n
  }
}

object SubwordTable {

  /** True iff the string has no unpaired surrogate code units — every
    * high surrogate is followed by a low one and no low surrogate
    * stands alone.
    */
  def wellFormedUtf16(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
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
  *
  * Words seed by CODEPOINT (r14 ADVICE): a non-BMP character is one
  * base symbol, never two surrogate halves — matching DuckDB's
  * codepoint-based str_split, so the t37/t38 oracles agree beyond the
  * BMP and emitted tokens are always valid Unicode.
  *
  * MERGE-TABLE ORDER CONTRACT (r14 ADVICE): merges must be in LEARNED
  * CREATION order — rank k's pair may only reference symbols that exist
  * after ranks 0..k−1 applied, which is exactly what
  * [[graft.llm.TextStats.bpeLearnMerges]] produces. A table violating
  * that (e.g. rank("ab","c") listed BEFORE rank("a","b")) silently
  * under-merges here ("abc" → [ab, c], not [abc]), where a
  * re-scan-to-fixpoint BPE apply would still reach [abc]; the
  * rank-ordered single pass is the form the SQL oracle replays, so the
  * order contract is a precondition of the public Bpe.count/tokens API,
  * not a defect of the learned chain.
  *
  * APPLY-COST TRAJECTORY (r15): the rank-ordered pass is O(K·len) per
  * word. For production-sized tables the apply dispatches to the
  * PRIORITY-QUEUE form (always merge the lowest-rank adjacent pair,
  * leftmost first among equals — the tiktoken/HF inference algorithm;
  * O(len·log len) per word, K-INDEPENDENT), but only when that is
  * provably the same function: the PQ form diverges from sequential
  * rank passes exactly when applying a later rank can create an
  * adjacency an earlier rank matches, i.e. when some rank's merged
  * string equals a side of an EARLIER rank's pair (two different
  * splits can produce the same string), or when a pair appears at two
  * ranks. [[pqSafe]] checks the negation of both once at construction
  * — if every pair is unique and no merged(k) is a side of any rank
  * j < k, every pair created mid-walk has a rank above the one being
  * applied, so the global lowest-rank-first order replays the pass
  * order exactly (SubwordScaleSpec property-tests the equality on
  * learned tables and exhibits the divergence on an adversarial one).
  * Unsafe or small (K < [[BpeTable.PqMinMerges]] — below it the
  * cache-friendly passes win, and every oracle-pinned registry table
  * is K = 32) tables keep the rank-ordered pass, which remains the
  * reference semantics and the form the SQL oracle replays.
  */
object BpeTable {

  /** Dispatch threshold for the PQ apply: below it the rank-ordered
    * passes are cheap and cache-friendly (and every oracle-pinned
    * registry table is K = 32, so registry plans keep the exact
    * reference code path); at or above it the K-independent walk wins
    * (SubwordScaleSpec measures the crossover at K = 1024).
    */
  val PqMinMerges = 64
}

class BpeTable(val merges: Array[(String, String)]) extends Serializable {

  def count(s: UTF8String): Long = walkText(s.toString, null)

  /** rank of each (left, right) pair — two-level map so symbols
    * containing any delimiter char can never collide keys.
    */
  @transient private lazy val rankOf
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var k = 0
    while (k < merges.length) {
      val (a, b) = merges(k)
      var inner = m.get(a)
      if (inner == null) { inner = new java.util.HashMap[String, Integer](); m.put(a, inner) }
      if (!inner.containsKey(b)) inner.put(b, Integer.valueOf(k))
      k += 1
    }
    m
  }

  /** True iff the PQ (lowest-rank-first) apply provably equals the
    * sequential rank passes on EVERY input: every pair unique, every
    * side non-empty, and no rank's merged string equals a side of any
    * earlier-or-same rank (so a pair created mid-walk always carries a
    * rank ABOVE the one being applied — the heap order then replays
    * the pass order exactly). Checked once; see the class scaladoc.
    */
  @transient lazy val pqSafe: Boolean = {
    val sides = new java.util.HashSet[String]()
    val seen = new java.util.HashSet[String]()
    var ok = true
    var k = 0
    while (ok && k < merges.length) {
      val (a, b) = merges(k)
      // length-prefixed key is injective: the prefix pins the split
      ok = a.nonEmpty && b.nonEmpty && seen.add(s"${a.length}:$a$b")
      if (ok) {
        sides.add(a)
        sides.add(b)
        ok = !sides.contains(a + b)
      }
      k += 1
    }
    ok
  }

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
      val cp = str.codePointAt(i)
      if (Character.isWhitespace(cp)) { i += Character.charCount(cp) }
      else {
        var we = i
        var scanning = true
        while (scanning && we < len) {
          val c = str.codePointAt(we)
          if (Character.isWhitespace(c)) scanning = false
          else we += Character.charCount(c)
        }
        n += word(str.substring(i, we), out)
        i = we
      }
    }
    n
  }

  /** Tokenize one word; returns its token count (and appends tokens
    * when `out` is non-null). Dispatches to the K-independent PQ walk
    * for big tables where that is provably the same function (see the
    * class scaladoc); the rank-ordered pass below remains the
    * reference semantics.
    */
  def word(w: String, out: java.util.ArrayList[UTF8String]): Long =
    if (merges.length >= BpeTable.PqMinMerges && pqSafe) wordPq(w, out)
    else wordPass(w, out)

  private def seedSyms(w: String): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](w.length)
    var c = 0
    while (c < w.length) {
      val n = Character.charCount(w.codePointAt(c))
      syms.add(w.substring(c, c + n))
      c += n
    }
    syms
  }

  /** Reference apply: every merge in rank order, one greedy-left pass
    * per rank — the form the SQL oracles replay.
    */
  private[functions] def wordPass(w: String,
      out: java.util.ArrayList[UTF8String]): Long = {
    var syms = seedSyms(w)
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

  /** K-independent apply: always merge the lowest-rank adjacent pair,
    * leftmost first among equal ranks (heap keyed rank<<32|pos over a
    * doubly-linked symbol list, entries re-validated on pop — the
    * standard BPE inference walk). Equal to [[wordPass]] whenever
    * [[pqSafe]] holds: every pair created by a merge then carries a
    * rank strictly above the one just applied, so the heap pops ranks
    * in exactly the pass order, and within a rank the pos key replays
    * the greedy-left sweep (a consumed occurrence re-validates false).
    */
  private[functions] def wordPq(w: String,
      out: java.util.ArrayList[UTF8String]): Long = {
    val syms = seedSyms(w)
    val n = syms.size()
    if (n <= 1) {
      if (out != null && n == 1) out.add(UTF8String.fromString(syms.get(0)))
      return n.toLong
    }
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      nxt(i) = if (i == n - 1) -1 else i + 1
      prv(i) = i - 1
      alive(i) = true
      i += 1
    }
    def rankAt(p: Int): Int = {
      val q = nxt(p)
      if (q < 0) -1
      else {
        val inner = rankOf.get(syms.get(p))
        if (inner == null) -1
        else {
          val r = inner.get(syms.get(q))
          if (r == null) -1 else r.intValue()
        }
      }
    }
    val pq = new java.util.PriorityQueue[java.lang.Long]()
    def push(p: Int): Unit = {
      val r = rankAt(p)
      if (r >= 0) { pq.add(java.lang.Long.valueOf((r.toLong << 32) | p.toLong)); () }
    }
    i = 0
    while (i < n - 1) { push(i); i += 1 }
    var count = n.toLong
    while (!pq.isEmpty) {
      val e = pq.poll().longValue()
      val r = (e >>> 32).toInt
      val p = (e & 0xffffffffL).toInt
      // re-validate: the pair at p must still be THIS rank's pair
      // (pairs are unique under pqSafe, so rank equality pins the pair)
      if (alive(p) && rankAt(p) == r) {
        val q = nxt(p)
        syms.set(p, syms.get(p) + syms.get(q))
        alive(q) = false
        nxt(p) = nxt(q)
        if (nxt(q) >= 0) prv(nxt(q)) = p
        count -= 1
        if (prv(p) >= 0) push(prv(p))
        push(p)
      }
    }
    if (out != null) {
      // index 0 is never consumed (merges absorb the RIGHT symbol), so
      // the walk from 0 visits every survivor in order
      var p = 0
      while (p >= 0) {
        out.add(UTF8String.fromString(syms.get(p)))
        p = nxt(p)
      }
    }
    count
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
