package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) vector folds for the embedding hot path.
  *
  * The built-in higher-order functions (`aggregate`, `zip_with`,
  * `transform`) have no `doGenCode` — every per-element lambda step runs
  * interpreted, which dominates ANN/dedup scans that fold 64-dim vectors
  * per candidate pair. These expressions emit a tight scalar loop inside
  * whole-stage codegen instead.
  *
  * Determinism contract (ARCHITECTURE.md): the loop accumulates in
  * index order with plain IEEE adds/multiplies — `acc + a[i] * b[i]` —
  * exactly the ordered left fold `aggregate(zip_with(a, b, _ * _),
  * 0.0, _ + _)` performs and the same order DuckDB's list folds use, so
  * the produced doubles are bit-identical to both (no FMA, no
  * reassociation). Verified cross-engine by every vector oracle.
  *
  * Null contract: null input array → null; arrays are element
  * non-null by construction (embedding columns). Unequal lengths fold
  * the common prefix (zip_with would pad with null and poison the sum —
  * don't feed unequal lengths either way).
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = acc + x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

/** Σ x[i]² in index order — `norm = sqrt(sum_squares)` composes at the
  * Column layer so the sqrt stays a built-in. Same fold-order contract
  * as [[DotProductDouble]]. */
case class SumSquaresDouble(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sum_squares_double"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); acc = acc + v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = $a.getDouble($i);
         |  $acc = $acc + $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSquaresDouble =
    copy(child = newChild)
}

/** All `m` PQ code assignments in ONE constant-size expression:
  * `codes[m] = argmax_code round(dot(v[m·subDims..], cb[m][code]) /
  * (|sub| · |cb[m][code]|), 6)`, ties to the lowest code id.
  *
  * Why an expression and not a Column tree: the column formulation
  * (m × k literal-scored structs through array_max) generates
  * O(m·k·subDims) Java per projection — at the FAISS-standard geometry
  * (m=16, k=16) janino aborts on the 64 KB method limit and the whole
  * stage falls back to interpreted eval. Here the codebooks ride as ONE
  * reference object and codegen emits a single call into [[encode]], so
  * the projection stays inside whole-stage codegen at any m·k — the
  * production-PQ regime (m=16, k=256) included.
  *
  * Numeric parity with the column form is bit-exact and spec-pinned
  * (PqEncodeExprSpec): index-order dot/sumsq folds over the slice
  * (truncated like `slice()` when the vector is short), the same
  * `BigDecimal.valueOf(...).setScale(6, HALF_UP)` rounding Spark's
  * `round` emits (NaN/Inf pass through), and the same double ordering
  * `array_max` applies to the struct scores — `-0.0 == 0.0`, NaN
  * greatest (SQLOrderingUtil semantics), equal scores tie to the
  * lowest code id.
  *
  * One deliberate divergence: on a zero-norm slice the column form's
  * ANSI `Divide` throws DIVIDE_BY_ZERO, killing the job on one
  * degenerate row; here the NaN cosines flow through the NaN-greatest
  * ordering and the subspace deterministically takes its lowest code
  * id — a total function is the only acceptable shape for a 100 TB
  * corpus encode. (No gated fixture contains a zero subvector, so the
  * oracles see identical behavior either way.) */
case class PqEncodeCodes(child: Expression,
    codebooks: Seq[Seq[(Long, Seq[Double])]], subDims: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"

  @transient private lazy val cws: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_._2.toArray).toArray).toArray
  @transient private lazy val pids: Array[Array[Long]] =
    codebooks.map(_.map(_._1).toArray).toArray
  // codeword norms are driver-side constants, exactly the lit(cnorm)
  // the column form embeds
  @transient private lazy val cnorms: Array[Array[Double]] =
    cws.map(_.map { cw =>
      var acc = 0.0; var i = 0
      while (i < cw.length) { acc = acc + cw(i) * cw(i); i += 1 }
      math.sqrt(acc)
    })

  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinity) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Public so generated code can call it through the reference obj. */
  def encode(a: Any): ArrayData = {
    val v = a.asInstanceOf[ArrayData]
    val nv = v.numElements()
    val out = new Array[Long](cws.length)
    var m = 0
    while (m < cws.length) {
      val base = m * subDims
      val nSub = math.max(0, math.min(subDims, nv - base))
      var ss = 0.0
      var j = 0
      while (j < nSub) {
        val x = v.getDouble(base + j); ss = ss + x * x; j += 1
      }
      val vn = math.sqrt(ss)
      var bestCos = 0.0
      var bestPid = 0L
      var first = true
      var c = 0
      while (c < cws(m).length) {
        val cw = cws(m)(c)
        val n = math.min(nSub, cw.length)
        var d = 0.0
        j = 0
        while (j < n) { d = d + v.getDouble(base + j) * cw(j); j += 1 }
        val cos = round6(d / (vn * cnorms(m)(c)))
        val pid = pids(m)(c)
        // SQLOrderingUtil double semantics: primitive == first (so
        // -0.0 == 0.0), then Double.compare (NaN greatest, NaN == NaN)
        val cmp =
          if (first) 1
          else if (cos == bestCos) 0
          else java.lang.Double.compare(cos, bestCos)
        if (cmp > 0 || (cmp == 0 && pid < bestPid)) {
          bestCos = cos; bestPid = pid
        }
        first = false
        c += 1
      }
      out(m) = bestPid
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncodeCodes].getName)
      s"${ev.value} = $ref.encode($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}
