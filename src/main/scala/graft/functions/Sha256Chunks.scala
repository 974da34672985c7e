package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SHA-256 chunk hashes: `sha256_chunks(s, n)` returns the first
  * `n` 60-bit hash values of `s`, where chunk `k` is hex nibbles
  * `[15k, 15k+15)` of the digest read big-endian — BIT-IDENTICAL to the
  * builtin composition `conv(substring(sha2(s,256), 15k+1, 15), 16, 10)`
  * (verified by Sha256ChunksSpec property tests), which is what the
  * DuckDB oracles replay. The win is mechanical, not semantic: one
  * thread-local MessageDigest (the builtin `sha2` news one per call),
  * no 64-char hex-string materialization, and no per-chunk string
  * substring/`conv` radix parse — the digest bytes go straight to
  * longs. This sits under every minhash/simhash signature scan, the
  * hottest CPU in the dedup family.
  */
case class Sha256Chunks(child: Expression, nChunks: Int)
    extends UnaryExpression {

  require(nChunks >= 1 && nChunks * 15 <= 64,
    s"nChunks must be in [1, 4] (60 bits per chunk from a 256-bit digest), got $nChunks")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sha256_chunks"

  override def nullSafeEval(s: Any): Any =
    Sha256Chunks.chunks(s.asInstanceOf[UTF8String], nChunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sha256Chunks.chunks($c, $nChunks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sha256Chunks {

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** Static entry shared by interpreted eval and generated code. */
  def chunks(s: UTF8String, n: Int): ArrayData = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      var v = 0L
      var j = 15 * k
      val end = j + 15
      while (j < end) {
        val b = d(j >> 1) & 0xff
        v = (v << 4) | (if ((j & 1) == 0) b >> 4 else b & 0xf)
        j += 1
      }
      out(k) = v
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array of the first `n` 60-bit chunk hashes. */
  def sha256Chunks(c: Column, n: Int): Column =
    Shim.column(Sha256Chunks(Shim.expression(c), n))
}
