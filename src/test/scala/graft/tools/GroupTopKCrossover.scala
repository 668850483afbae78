package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc crossover measurement (not part of the driver contract):
  * window-rank filter vs the GroupTopK partial/final heaps across group
  * cardinalities and k, to place `spark.graft.groupTopK.maxK`.
  * Results recorded in ARCHITECTURE.md (GroupTopK section). */
object GroupTopKCrossover {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 4000000L
    def data(nGroups: Int) = spark.range(n).select(
      (col("id") % nGroups).as("g"),
      col("id").as("id"),
      pmod(hash(col("id")), lit(1000000)).cast("long").as("v"))
      .repartition(8)

    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(f"${"nGroups"}%8s ${"rows/grp"}%8s ${"k"}%7s ${"window_s"}%9s ${"topk_s"}%8s ratio")
    for (nGroups <- Seq(100, 10000, 400000); k <- Seq(10, 100, 1000, 10000)) {
      val rowsPerGroup = n / nGroups
      if (k <= 2L * rowsPerGroup) {   // k far past group size is a no-op
        val df = data(nGroups).localCheckpoint(true)
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
        // warm both paths once
        df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
        graft.plans.GroupTopK.topK(df, Seq(col("g")), k, col("v").desc, col("id").asc).count()
        val tw = timeIt(df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).count())
        val tk = timeIt(graft.plans.GroupTopK
          .topK(df, Seq(col("g")), k, col("v").desc, col("id").asc).count())
        println(f"$nGroups%8d $rowsPerGroup%8d $k%7d $tw%9.2f $tk%8.2f ${tk / tw}%5.2f")
      }
    }
    spark.stop()
  }
}
