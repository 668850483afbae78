package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

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
    val docs = Tables(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), col("source"),
      array_distinct(DedupOps.words(col("text"))).as("ts"))

    time("d04_string_arrays") {
      toks.as("a").join(broadcast(toks.as("b")),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.source").as("source"), col("a.doc_id").as("a_id"),
          col("b.doc_id").as("b_id"),
          size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
          size(col("a.ts")).as("na"), size(col("b.ts")).as("nb"))
        .select(col("source"), col("a_id"), col("b_id"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.8).count()
    }

    // dictionary-encode tokens -> int ids (tiny vocab broadcast), then
    // int-array intersection
    time("d04_dict_encoded") {
      val vocab = toks.select(explode(col("ts")).as("w")).distinct()
        .withColumn("wid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("w")))
      val enc = toks.select(col("doc_id"), col("source"), explode(col("ts")).as("w"))
        .join(broadcast(vocab), "w")
        .groupBy(col("doc_id"), col("source"))
        .agg(sort_array(collect_list(col("wid"))).as("ts"))
        .localCheckpoint(true)
      enc.as("a").join(broadcast(enc.as("b")),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.source").as("source"), col("a.doc_id").as("a_id"),
          col("b.doc_id").as("b_id"),
          size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
          size(col("a.ts")).as("na"), size(col("b.ts")).as("nb"))
        .select(col("source"), col("a_id"), col("b_id"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
