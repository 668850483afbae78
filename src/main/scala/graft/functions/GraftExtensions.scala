package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native vector
  * folds as SQL functions, so `spark.sql("SELECT dot_double(a, b)")`
  * works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or SparkSessionExtensionsProvider injection in tests). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "dot_double"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_double(a, b) takes two arguments")
        DotProductDouble(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sum_squares_double"),
      new ExpressionInfo(classOf[SumSquaresDouble].getName, "sum_squares_double"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "sum_squares_double(a) takes one argument")
        SumSquaresDouble(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sq8_encode"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "sq8_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "sq8_encode(v, mins, steps) takes three arguments")
        Sq8Encode(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("sq8_dequant"),
      new ExpressionInfo(classOf[Sq8Dequant].getName, "sq8_dequant"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "sq8_dequant(codes, mins, steps) takes three arguments")
        Sq8Dequant(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(s) takes one argument")
        NfcNormalize(args.head)
      }))
    // the GroupTopK operator: planner strategy + the window-rank-filter
    // rewrite rule (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToGroupTopK)
  }
}
