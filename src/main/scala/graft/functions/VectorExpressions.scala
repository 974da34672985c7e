package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embedding columns, with full whole-stage codegen (`doGenCode` emits a
  * tight primitive loop — no ArrayData boxing, no HOF interpretation).
  *
  * Numerics: accumulates in double in element order, exactly like the
  * HOF formulation `aggregate(zip_with(a,b,(x,y)->x*y),0D,+)` — results
  * are bit-identical to it, so swapping implementations never changes
  * oracle hashes. ~10× faster per row than the interpreted HOF chain on
  * 64-dim vectors.
  */
case class CosineSimF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over numeric arrays (`array<float>` or
  * `array<double>` on either side, mixed freely), double accumulation in
  * element order, full codegen. Used for LSH hyperplane signatures where
  * the embedding is float and the plane literal is double.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val getX = if (isFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val getY = if (isFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($getX($i)) * ($getY($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native product-quantization ENCODER over an `array<float>` embedding:
  * per subspace m, the argmin-L2 sub-centroid id (ties to the smaller
  * cid via strict `<`), emitted as one `array<tinyint>` code (unsigned
  * 8-bit cids wrapped into signed bytes — `toByte` IS the wrap; the ADC
  * decode applies the matching +256). The codebook rides the expression
  * as a reference object (mSub·kCent·sub doubles — parameter-bounded),
  * so encoding a corpus is ONE narrow codegen'd projection: no
  * subspace explode, no broadcast join, no pair of hash aggregates —
  * the r12 replacement for the pqDists/pqArgmin/collect_list encode
  * pipeline on the persisted-index paths (s23 build, st12 generation
  * augment, delta encode), worth ~2 shuffles per build. Distances are
  * the plain running Σ(v−c)² — NOT pqDists's 6-dp-rounded expansion:
  * the rounding exists so s11's in-memory demo matches its SQL oracle
  * CTE-for-CTE; a persisted index has no SQL oracle to replay, and
  * rounding before an argmin only manufactures 1e-6 knife-edge ties.
  * Deterministic per (vector, codebook) either way.
  */
case class PqEncodeF32(child: Expression,
    cents: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def prettyName: String = "pq_encode_f32"

  // [ss][cid][j] — compiled once per task from the (small) Seq form the
  // tree carries for equality/explain
  @transient private lazy val table: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray

  private def encode(x: ArrayData): Array[Byte] = {
    val mSub = table.length
    val sub = table(0)(0).length
    val code = new Array[Byte](mSub)
    var m = 0
    while (m < mSub) {
      val cb = table(m)
      var best = 0
      var bestD = Double.PositiveInfinity
      var cid = 0
      while (cid < cb.length) {
        val c = cb(cid)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = x.getFloat(m * sub + j).toDouble - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = cid }
        cid += 1
      }
      code(m) = best.toByte
      m += 1
    }
    code
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encode(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.addReferenceObj("pqTable", table, "double[][][]")
      val mSub = table.length
      val sub = table(0)(0).length
      val code = ctx.freshName("code")
      val m = ctx.freshName("m")
      val cb = ctx.freshName("cb")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cid = ctx.freshName("cid")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      s"""
         |byte[] $code = new byte[$mSub];
         |for (int $m = 0; $m < $mSub; $m++) {
         |  double[][] $cb = $tbl[$m];
         |  int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $cid = 0; $cid < $cb.length; $cid++) {
         |    double[] $c = $cb[$cid];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      double $diff = ((double) $a.getFloat($m * $sub + $j)) - $c[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $cid; }
         |  }
         |  $code[$m] = (byte) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($code);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[CosineSimF32]]. */
  def cosineF32(a: Column, b: Column): Column =
    Shim.column(CosineSimF32(Shim.expression(a), Shim.expression(b)))

  /** Column API for [[PqEncodeF32]] — `cents` in the `pqTrain` layout
    * (ss, cid, centroid), regrouped here to the [ss][cid][j] table.
    */
  def pqEncodeF32(a: Column, cents: Seq[(Long, Long, Seq[Double])]): Column = {
    val table: Seq[Seq[Seq[Double]]] = cents.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }
    Shim.column(PqEncodeF32(Shim.expression(a), table))
  }

  /** Column API for [[ArrayDot]]. */
  def arrayDot(a: Column, b: Column): Column =
    Shim.column(ArrayDot(Shim.expression(a), Shim.expression(b)))

  /** Make the native expressions callable from SQL text
    * (`SELECT cosine_f32(a, b)`); idempotent per session.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    Shim.registerFunction(spark, "cosine_f32", es => CosineSimF32(es(0), es(1)))
    Shim.registerFunction(spark, "array_dot", es => ArrayDot(es(0), es(1)))
    // second arg must be a literal chunk count (it shapes the output
    // type, which is fixed at analysis time) — reject non-foldable or
    // null counts with an analysis error instead of an opaque runtime NPE
    Shim.registerFunction(spark, "sha256_chunks", es => {
      val n = if (es.length == 2 && es(1).foldable) es(1).eval(null) else null
      n match {
        case num: Number if num.intValue >= 1 && num.intValue <= 4 =>
          Sha256Chunks(es(0), num.intValue)
        case num: Number => throw Shim.analysisException(
          s"sha256_chunks(expr, n): the chunk count must be in [1, 4] " +
            s"(60 bits per chunk from a 256-bit digest), got ${num.intValue}")
        case _ => throw Shim.analysisException(
          "sha256_chunks(expr, n): the chunk count must be a non-null " +
            "integer literal (it fixes the output array length at plan time)")
      }
    })
  }
}
