package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc recall probe for the banded near-dup ops (not part of the
  * driver contract): computes the exhaustive hamming≤2 truth and the
  * registry query's banded result at a given scale, reporting
  * planted-pair recovery and overall recall — the same measurement
  * MultimodalRecallSpec pins at sf0.001, runnable at bigger fixtures
  * where the all-pairs truth is still affordable.
  *
  * Usage: Test/runMain graft.RecallProbe <sfDir> [mm05|mm06 ...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("mm05", "mm06")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir, "documents")

    def probe(name: String): Unit = {
      val (corpus, sigCol, queryName) = name match {
        case "mm05" =>
          val c = docs.select(col("doc_id"), col("text")).unionByName(
            docs.filter(col("doc_id") % 10 === 0)
              .select((col("doc_id") + 100000).as("doc_id"),
                expr("substr(text, 1, length(text) - 1)").as("text")))
          val s = c.withColumn("es", expr(
              "transform(sequence(0, 63), f -> aggregate(" +
                "transform(filter(split(substr(text, f*4+1, 4), ''), c -> c <> '')," +
                " c -> CAST(ascii(c) * ascii(c) AS BIGINT))," +
                " CAST(0 AS BIGINT), (a, x) -> a + x))"))
            .withColumn("te", expr(
              "aggregate(es, CAST(0 AS BIGINT), (a, x) -> a + x)"))
            .withColumn("fp", concat_ws("", transform(col("es"),
              e => when(e * 64 > col("te"), lit("1")).otherwise(lit("0")))))
            .select(col("doc_id") +:
              (0 until 4).map(b => conv(substring(col("fp"), b * 16 + 1, 16), 2, 10)
                .cast("long").as(s"w$b")): _*)
          (c, s, "mm05_image_neardup")
        case _ =>
          val c = docs.select(col("doc_id"), col("text")).unionByName(
            docs.filter(col("doc_id") % 8 === 0)
              .select((col("doc_id") + 100000).as("doc_id"),
                concat(col("text"), lit("x")).as("text")))
          val s = c.withColumn("es", expr(
              "transform(sequence(0, 32), f -> aggregate(" +
                "transform(filter(split(substr(text, f*4+1, 4), ''), c -> c <> '')," +
                " c -> CAST(ascii(c) * ascii(c) AS BIGINT))," +
                " CAST(0 AS BIGINT), (a, x) -> a + x))"))
            .withColumn("fp", expr(
              "array_join(transform(sequence(0, 31), f -> " +
                "CASE WHEN element_at(es, f+2) >= element_at(es, f+1) " +
                "THEN '1' ELSE '0' END), '')"))
            .select(col("doc_id"), conv(col("fp"), 2, 10).cast("long").as("w0"))
          (c, s, "mm06_audio_neardup")
      }
      val wCols = sigCol.columns.filter(_.startsWith("w"))
      val ham = wCols.map(w =>
        bit_count(col(s"a.$w").bitwiseXOR(col(s"b.$w")))).reduce(_ + _)
      val truth = sigCol.as("a")
        .join(sigCol.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          ham.as("h"))
        .filter(col("h") <= 2)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = QueryRegistry.byName(queryName).run(spark, dir)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = truth.filter { case (a, b) => b - a == 100000L }
      val plantedGot = planted.intersect(got)
      println(f"[recall] $queryName%-22s truth=${truth.size}%6d " +
        f"got=${got.size}%6d recall=${got.size.toDouble / truth.size}%.4f " +
        f"planted=${plantedGot.size}/${planted.size} " +
        f"spurious=${(got -- truth).size}")
    }
    names.foreach(probe)
    spark.stop()
  }
}
