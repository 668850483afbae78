package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom operator must agree exactly with the window-rank form
  * and plan as partial+final heaps with no per-group sort. */
class GroupTopKSpec extends SparkSpec {

  test("GroupTopK == window-rank filter on random data (incl. groups < k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(200).toLong, i.toLong, rnd.nextDouble())
    } ++ Seq((9999L, 100000L, 0.5))   // a singleton group (< k rows)
    val df = rows.toDF("g", "id", "score").repartition(7)

    val viaOp = GroupTopK.topK(df, Seq(col("g")), 3,
        col("score").desc, col("id").asc)
      .select("g", "id")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("g", "id")

    assert(viaOp.count() == viaWindow.count())
    assert(viaOp.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaOp).count() == 0)
  }

  test("plans as partial+final heaps; no Window, no per-group Sort") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 5, i)).toDF("g", "x")
      .repartition(4)
    val out = GroupTopK.topK(df, Seq(col("g")), 2, col("x").desc)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopKPartial"), plan)
    assert(plan.contains("GroupTopKFinal"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
    // the exchange sits between partial and final (partial bounds what
    // is shuffled to k rows per group per input partition)
    assert(plan.indexOf("GroupTopKFinal") < plan.indexOf("Exchange"), plan)
    assert(plan.indexOf("Exchange") < plan.indexOf("GroupTopKPartial"), plan)
    assert(out.count() == 10)
  }

  test("optimizer rule rewrites window-rank filters into GroupTopK (same results)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 2000).map(i => (rnd.nextInt(50), i, rnd.nextDouble()))
      .toDF("g", "id", "score").repartition(5)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    def ranked = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val expected = ranked.collect().map(_.toString).sorted.toSeq  // rule off
    GroupTopKRewrite.enable(spark)
    try {
      val plan = ranked.queryExecution.executedPlan.toString
      assert(plan.contains("GroupTopKPartial"), plan)
      assert(ranked.collect().map(_.toString).sorted.toSeq == expected)
    } finally GroupTopKRewrite.disable(spark)
    // rule off again: back to the plain window plan
    assert(!ranked.queryExecution.executedPlan.toString.contains("GroupTopK"))
  }

  test("rewrite honors the conf escape hatch and the maxK memory guard") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 5, i, i * 1.5))
      .toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc)
    def ranked(k: Int) =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    GroupTopKRewrite.enable(spark)
    try {
      assert(ranked(3).queryExecution.executedPlan.toString
        .contains("GroupTopKPartial"))
      // k past the guard: partial heaps would hold k rows per (group,
      // partition) — fall back to the window form, which spills
      spark.conf.set("spark.graft.groupTopK.maxK", "10")
      assert(!ranked(11).queryExecution.executedPlan.toString
        .contains("GroupTopK"))
      assert(ranked(10).queryExecution.executedPlan.toString
        .contains("GroupTopKPartial"))
      // session-level off switch
      spark.conf.unset("spark.graft.groupTopK.maxK")
      spark.conf.set("spark.graft.groupTopK.rewrite", "false")
      assert(!ranked(3).queryExecution.executedPlan.toString
        .contains("GroupTopK"))
    } finally {
      // unset BOTH confs here — an assertion failure above must not
      // leak a 10-row cap into the shared session
      spark.conf.unset("spark.graft.groupTopK.maxK")
      spark.conf.unset("spark.graft.groupTopK.rewrite")
      GroupTopKRewrite.disable(spark)
    }
  }

  test("emits each group's rows in sort order") {
    import spark.implicits._
    val df = Seq((1, 30), (1, 10), (1, 20), (2, 5)).toDF("g", "x")
    val got = GroupTopK.topK(df, Seq(col("g")), 2, col("x").asc)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }
}
