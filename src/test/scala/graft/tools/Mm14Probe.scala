package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc probe: where does mm14's 10x soak go super-linear — the
  * fingerprint build (linear stages) or the key-collision candidate
  * join (quadratic in per-key multiplicity)? */
object Mm14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.1", "/tmp/sf1soak").foreach { dir =>
      val docs = Tables(spark, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") % 10 === 0 && length(col("text")) >= 96)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("substr(text, 33)").as("text")))
      val fr = corpus
        .withColumn("f", explode(sequence(lit(0L), least(
          ceil(length(col("text")) / 16.0).cast("long") - 1, lit(63L)))))
        .withColumn("frame",
          col("text").substr((col("f") * 16 + 1).cast("int"), lit(16)))
        .select(col("doc_id"), col("f"),
          aggregate(
            transform(split(col("frame"), ""),
              c => (ascii(c) * ascii(c)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("e"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      val pk = fr
        .withColumn("ep", lag(col("e"), 1).over(w))
        .withColumn("en", lead(col("e"), 1).over(w))
        .filter(col("ep").isNotNull && col("en").isNotNull &&
          col("e") > col("ep") && col("e") >= col("en"))
        .select(col("doc_id"), col("f"), col("e"))
      val fp = pk.as("p1")
        .join(pk.as("p2"),
          col("p2.doc_id") === col("p1.doc_id") &&
            col("p2.f") - col("p1.f") >= 1 && col("p2.f") - col("p1.f") <= 6)
        .select(col("p1.doc_id").as("doc_id"), col("p1.f").as("anchor"),
          md5(concat_ws(":", col("p1.e"), col("p2.e"),
            (col("p2.f") - col("p1.f")))).as("k"))
        .localCheckpoint()
      val nFp = fp.count()
      val mult = fp.groupBy(col("k")).agg(count(lit(1)).as("m"))
        .agg(sum(col("m")).as("rows"), sum(col("m") * col("m")).as("sq"),
          max(col("m")).as("maxm"), countDistinct(col("k")).as("keys"))
        .collect()(0)
      println(s"[mm14probe] $dir fp=$nFp keys=${mult.getLong(3)} " +
        s"sumM2=${mult.getLong(1)} maxMult=${mult.getLong(2)}")
    }
    spark.stop()
  }
}
