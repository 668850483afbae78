package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EquiDepth must be EXACTLY the SQL window functions it replaces —
  * the whole point is identical output without the single-partition
  * WindowExec. The reference implementation here is Spark's own
  * ntile/row_number over an unpartitioned window (fine at test scale),
  * compared row-for-row. */
class EquiDepthSpec extends SparkSpec {

  // deterministic data with HEAVY ties on the value column (97 distinct
  // values over 1000 rows) — ties are where ntile arithmetic and range
  // boundaries earn their tiebreak column
  private def data = spark.range(1, 1001).toDF("id")
    .withColumn("v", pmod(hash(col("id")), lit(97)))

  private def mismatches(got: org.apache.spark.sql.DataFrame,
      want: org.apache.spark.sql.DataFrame): Long =
    got.join(want, Seq("id"))
      .filter(col("got") =!= col("want")).count()

  test("ntileExact == ntile for n across and beyond the row count") {
    val df = data
    // n > N exercises the every-row-its-own-bucket edge (q = 0)
    for (n <- Seq(1, 4, 7, 16, 997, 1500)) {
      val want = df.select(col("id"),
        ntile(n).over(Window.orderBy(col("v"), col("id")))
          .cast("long").as("want"))
      val got = EquiDepth.ntileExact(df, n, Seq(col("v"), col("id")), "b")
        .select(col("id"), col("b").as("got"))
      assert(mismatches(got, want) == 0, s"ntileExact diverges at n=$n")
      Stage.drain(spark)
    }
  }

  test("withGlobalRank == row_number, including DESC order") {
    val df = data
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(col("v").desc, col("id")))
        .cast("long").as("want"))
    val got = EquiDepth
      .withGlobalRank(df, Seq(col("v").desc, col("id")), "r", "n")
      .select(col("id"), col("r").cast("long").as("got"))
    assert(mismatches(got, want) == 0, "global rank diverges under DESC")
    Stage.drain(spark)
  }

  test("totalCol carries the exact row count on every row") {
    val totals = EquiDepth
      .withGlobalRank(data, Seq(col("v"), col("id")), "r", "n")
      .select(col("n")).distinct().collect().map(_.getLong(0))
    assert(totals.toSeq == Seq(1000L))
    Stage.drain(spark)
  }

  test("empty input yields empty output, no error") {
    val empty = data.filter(col("id") < 0)
    assert(EquiDepth.ntileExact(empty, 16,
      Seq(col("v"), col("id")), "b").count() == 0)
    Stage.drain(spark)
  }
}
