package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native (codegen'd) int8 scalar quantization for the embedding
  * compression path.
  *
  * At 100 TB the float corpus does not fit executor memory; the ANN
  * scan reads 8-bit codes (8× smaller than doubles, 4× smaller than
  * floats) and dequantizes inside the scan loop. Per dimension `d` with
  * per-dim quantization params (mins[d], steps[d] = (max-min)/256):
  *
  *   encode:  code[d] = clamp(floor((x[d] - mins[d]) / steps[d]), 0, 255)
  *   dequant: x'[d]   = mins[d] + (code[d] + 0.5) * steps[d]
  *
  * Determinism contract (ARCHITECTURE.md): plain IEEE subtract / divide
  * / floor and fused in index order — DuckDB reproduces the identical
  * doubles from the same SQL arithmetic, so the s06 oracle hash-matches
  * bit-for-bit. A constant dimension (step = 0) encodes to 0 and
  * dequantizes to mins[d] exactly in both engines.
  *
  * Null contract: any null input → null, and (for inputs typed with
  * containsNull=true, parquet's default) any null ELEMENT nulls the
  * whole result — getDouble on a null slot would otherwise yield a
  * silent 0.0/garbage code diverging from the oracle without an error.
  * Codes are unsigned bytes (stored in Java's signed byte, masked 0xFF
  * on decode). A vector/params dimensionality mismatch throws —
  * silently truncating to the common prefix would produce
  * plausible-looking but wrong similarities downstream (and would
  * diverge from the oracle's explicit 64-dim indexing).
  */
case class Sq8Encode(vec: Expression, mins: Expression, steps: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mins
  override def third: Expression = steps

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(vec, mins, steps).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three array<double> arguments, got " +
        Seq(vec, mins, steps).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  // element-nullability is static per input — the null-slot guard is
  // only paid (in eval and in the generated loop) when the type admits it
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def nullable: Boolean =
    super.nullable || Seq(vec, mins, steps).exists(elemNullable)

  override def nullSafeEval(v: Any, mn: Any, st: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = mn.asInstanceOf[ArrayData]
    val s = st.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(m.numElements() == n && s.numElements() == n,
      s"sq8_encode: vector has $n dims but params have " +
        s"${m.numElements()}/${s.numElements()}")
    if (elemNullable(vec) || elemNullable(mins) || elemNullable(steps)) {
      var d = 0
      while (d < n) {
        if ((elemNullable(vec) && x.isNullAt(d)) ||
            (elemNullable(mins) && m.isNullAt(d)) ||
            (elemNullable(steps) && s.isNullAt(d))) return null
        d += 1
      }
    }
    val out = new Array[Byte](n)
    var d = 0
    while (d < n) {
      val step = s.getDouble(d)
      var code = 0L
      if (step != 0.0) {
        code = math.floor((x.getDouble(d) - m.getDouble(d)) / step).toLong
        if (code < 0L) code = 0L
        if (code > 255L) code = 255L
      }
      out(d) = code.toByte
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, st) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val step = ctx.freshName("step")
      val code = ctx.freshName("code")
      // null-slot guard only for inputs whose type admits null elements
      // (nullSafeCodeGen permits resultCode to set ev.isNull)
      val nullChecks = Seq(v -> elemNullable(vec), mn -> elemNullable(mins),
        st -> elemNullable(steps)).collect { case (nm, true) => s"$nm.isNullAt($d)" }
      val guard =
        if (nullChecks.isEmpty) ""
        else {
          val g = ctx.freshName("g")
          s"""
             |for (int $g = 0; $g < $n; $g++) {
             |  int $d = $g;
             |  if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }
             |}
           """.stripMargin
        }
      s"""
         |final int $n = $v.numElements();
         |if ($mn.numElements() != $n || $st.numElements() != $n) {
         |  throw new IllegalArgumentException("sq8_encode: vector has " + $n
         |    + " dims but params have " + $mn.numElements() + "/" + $st.numElements());
         |}
         |$guard
         |if (!${ev.isNull}) {
         |  final byte[] $out = new byte[$n];
         |  for (int $d = 0; $d < $n; $d++) {
         |    final double $step = $st.getDouble($d);
         |    long $code = 0L;
         |    if ($step != 0.0) {
         |      $code = (long) java.lang.Math.floor(
         |        ($v.getDouble($d) - $mn.getDouble($d)) / $step);
         |      if ($code < 0L) $code = 0L;
         |      if ($code > 255L) $code = 255L;
         |    }
         |    $out[$d] = (byte) $code;
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8Encode =
    copy(vec = newFirst, mins = newSecond, steps = newThird)
}

/** Inverse of [[Sq8Encode]]: codes → reconstructed array<double>, for
  * use under the existing codegen'd folds (DotProductDouble /
  * SumSquaresDouble) — decode-in-the-scan composes with the fold
  * inside one whole-stage-codegen span. */
case class Sq8Dequant(codes: Expression, mins: Expression, steps: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = mins
  override def third: Expression = steps

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(mins, steps).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (codes.dataType == BinaryType && arraysOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, array<double>), got " +
        Seq(codes, mins, steps).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_dequant"

  // same null-slot contract as Sq8Encode: a null element in the (possibly
  // containsNull=true) param arrays nulls the whole result
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def nullable: Boolean =
    super.nullable || elemNullable(mins) || elemNullable(steps)

  override def nullSafeEval(cs: Any, mn: Any, st: Any): Any = {
    val c = cs.asInstanceOf[Array[Byte]]
    val m = mn.asInstanceOf[ArrayData]
    val s = st.asInstanceOf[ArrayData]
    val n = c.length
    require(m.numElements() == n && s.numElements() == n,
      s"sq8_dequant: codes have $n dims but params have " +
        s"${m.numElements()}/${s.numElements()}")
    if (elemNullable(mins) || elemNullable(steps)) {
      var d = 0
      while (d < n) {
        if ((elemNullable(mins) && m.isNullAt(d)) ||
            (elemNullable(steps) && s.isNullAt(d))) return null
        d += 1
      }
    }
    val out = new Array[Double](n)
    var d = 0
    while (d < n) {
      out(d) = m.getDouble(d) + ((c(d) & 0xFF) + 0.5) * s.getDouble(d)
      d += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, mn, st) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val nullChecks = Seq(mn -> elemNullable(mins), st -> elemNullable(steps))
        .collect { case (nm, true) => s"$nm.isNullAt($d)" }
      val guard =
        if (nullChecks.isEmpty) ""
        else {
          val g = ctx.freshName("g")
          s"""
             |for (int $g = 0; $g < $n; $g++) {
             |  int $d = $g;
             |  if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }
             |}
           """.stripMargin
        }
      s"""
         |final int $n = $cs.length;
         |if ($mn.numElements() != $n || $st.numElements() != $n) {
         |  throw new IllegalArgumentException("sq8_dequant: codes have " + $n
         |    + " dims but params have " + $mn.numElements() + "/" + $st.numElements());
         |}
         |$guard
         |if (!${ev.isNull}) {
         |  final double[] $out = new double[$n];
         |  for (int $d = 0; $d < $n; $d++) {
         |    $out[$d] = $mn.getDouble($d) + (($cs[$d] & 0xFF) + 0.5) * $st.getDouble($d);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Sq8Dequant =
    copy(codes = newFirst, mins = newSecond, steps = newThird)
}
