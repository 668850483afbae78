package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val ev = Tables(spark, dir, "events")
    time("warm") { ev.count() }
    time("v01_variant") {
      ev.select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
        .filter(col("k") > 50).count()
    }
    time("v01_get_json_object") {
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(col("k") > 50).count()
    }
    time("v01_from_json") {
      ev.select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .filter(col("k") > 50).count()
    }
    spark.stop()
  }
}
