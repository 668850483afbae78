package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (round 12): does a localCheckpoint of a
  * hash-repartitioned frame carry its outputPartitioning to consumers
  * — i.e. does a downstream join/aggregate on the same key skip its
  * Exchange? Run: tools/java_run.sh (with test classes prepended). */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 97, i)).toDF("k", "v")
      .repartition(col("k"))
    val ck = df.localCheckpoint(true)
    println("plain localCheckpoint partitioning: " +
      ck.queryExecution.executedPlan.outputPartitioning)
    val st = graft.operators.Stage.stage(
      (1 to 1000).map(i => (i % 97, i)).toDF("k", "v")
        .repartition(col("k")))
    println("Stage.stage partitioning: " +
      st.queryExecution.executedPlan.outputPartitioning)
    val agg = st.groupBy("k").count()
    println("--- agg plan over staged frame (expect NO Exchange):")
    agg.explain("formatted")
    agg.show(3)
    spark.stop()
  }
}
