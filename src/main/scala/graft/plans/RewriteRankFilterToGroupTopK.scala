package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (ladder step (c), the `Rule[LogicalPlan]` leg):
  * rewrites the ubiquitous window-rank-filter idiom
  *
  *   Filter(rn <= k, Window(row_number() AS rn OVER (PARTITION BY g ORDER BY o)))
  *
  * into the same Window over `GroupTopK(g, o, k, child)` — the Window
  * then ranks at most k rows per group (already clustered by the
  * GroupTopK final stage) instead of shuffling and sorting every row
  * of every group. The Filter stays (it passes everything) and the
  * rank values are unchanged, because GroupTopK keeps exactly the rows
  * row_number would have ranked 1..k under the same total order.
  *
  * Deliberately narrow: a single row_number window expression with the
  * default row frame, a non-empty PARTITION BY, and an un-cast rank
  * comparison against an integer literal. Anything else is left alone.
  *
  * Memory guard: the partial stage holds k rows per (group, input
  * partition) on-heap, so the rewrite is skipped when k exceeds
  * `spark.graft.groupTopK.maxK` (default 10000) — past that the window
  * form's sort-and-spill is the safer plan. `spark.graft.groupTopK
  * .rewrite=false` turns the rewrite off entirely (session-level
  * escape hatch; the explicit GroupTopK.topKRanked API is unaffected).
  */
object RewriteRankFilterToGroupTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def sqlConf = org.apache.spark.sql.internal.SQLConf.get

  private def confOrFail[T](key: String, default: String, parse: String => T): T = {
    val v = sqlConf.getConfString(key, default)
    try parse(v)
    catch { case _: Exception => throw new IllegalArgumentException(
      s"Invalid value '$v' for conf '$key'.") }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!confOrFail(
      "spark.graft.groupTopK.rewrite", "true", _.toBoolean)) {
    plan
  } else plan.transformUp {
    case f @ Filter(cond, w @ Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, child, _))
        if part.nonEmpty && order.nonEmpty && !child.isInstanceOf[GroupTopK] =>
      rankLimit(splitConjunctivePredicates(cond), alias.toAttribute) match {
        case Some(k) if k > 0 &&
            k <= confOrFail("spark.graft.groupTopK.maxK", "10000", _.toInt) =>
          f.copy(child = w.withNewChildren(
            Seq(GroupTopK(part, order, k, child))))
        case _ => f
      }
  }

  private def rankLimit(preds: Seq[Expression], rn: Attribute): Option[Int] =
    preds.collectFirst {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k - 1
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k - 1
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => 1
    }
}

/** Runtime enablement for sessions not built with GraftExtensions. */
object GroupTopKRewrite {
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilterToGroupTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilterToGroupTopK
  }
  def disable(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteRankFilterToGroupTopK)
  }
}
