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
