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
    time("warm") { corpus.count() }
    time("simhash_sigs") {
      DedupOps.simhash64(corpus, "doc_id", "text").count()
    }
    val sigs = DedupOps.simhash64(corpus, "doc_id", "text").localCheckpoint(true)
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        concat(lit(b.toString), substring(col("simhash"), b * 16 + 1, 16))): _*))
        .as("band"))
    time("band_join_count") {
      bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id")).count()
    }
    val ham = (0 until 4).map { b =>
      bit_count(
        conv(substring(col("a_sig"), b * 16 + 1, 16), 2, 10).cast("long")
          .bitwiseXOR(conv(substring(col("b_sig"), b * 16 + 1, 16), 2, 10).cast("long")))
    }.reduce(_ + _)
    time("full_tail") {
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.simhash").as("a_sig"), col("b.simhash").as("b_sig"))
        .select(col("a_id"), col("b_id"), ham.cast("long").as("hamming"))
        .filter(col("hamming") <= 6).distinct().count()
    }
    spark.stop()
  }
}
