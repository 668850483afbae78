package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** The native folds must be BIT-identical to the interpreted
  * higher-order-function forms (the determinism contract every vector
  * oracle rides on) and must actually run inside whole-stage codegen. */
class VectorExpressionsSpec extends SparkSpec {

  test("dot/sum_squares match the higher-order-function folds bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1000).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), _ * _),
      lit(0.0), (acc, x) => acc + x)
    val hofSq = aggregate(transform(col("a"), x => x * x),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
        VectorOps.dot(col("a"), col("b")).as("nd"), hofDot.as("hd"),
        sqrt(hofSq).as("hn"), VectorOps.norm(col("a")).as("nn"))
      .filter(col("nd") =!= col("hd") || col("nn") =!= col("hn"))
      .count()
    assert(diff == 0)
  }

  test("native folds stay inside WholeStageCodegen (no fallback)") {
    // non-foldable input (range) so the projection really compiles
    val df = spark.range(10).select(
      VectorOps.dot(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), lit(4.0))).as("d"))
    // "*(n)" prefixes are the WholeStageCodegen markers in simpleString;
    // the Project carrying dot_double must be starred (a CodegenFallback
    // expression would force the whole projection out of codegen)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_double"), plan)
    assert(df.orderBy("d").collect().map(_.getDouble(0)).toSeq ==
      (0 until 10).map(i => i * 3.0 + 8.0))
  }
}
