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
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substr(text, instr(text, ' ') + 1)").as("text")))


    // d04 variants
    val toks = docs.select(col("doc_id"), col("source"),
      array_distinct(DedupOps.words(col("text"))).as("ts"))
    def d04(joined: org.apache.spark.sql.DataFrame): Long =
      joined
        .select(col("a.source").as("source"), col("a.doc_id").as("a_id"),
          col("b.doc_id").as("b_id"),
          size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
          size(col("a.ts")).as("na"), size(col("b.ts")).as("nb"))
        .select(col("source"), col("a_id"), col("b_id"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.8).count()
    time("d04_smj") {
      d04(toks.as("a").join(toks.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id")))
    }
    time("d04_bhj") {
      d04(toks.as("a").join(broadcast(toks.as("b")),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id")))
    }

    time("d04_bhj_prefilter") {
      val tn = toks.withColumn("n", size(col("ts")))
      d04(tn.as("a").join(broadcast(tn.as("b")),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")) * 179 >= (col("a.n") + col("b.n")) * 79))
    }
    spark.stop()

  }
}
