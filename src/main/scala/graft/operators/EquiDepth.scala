package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT an unpartitioned window.
  *
  * `ntile(k) OVER (ORDER BY ...)` / `row_number() OVER (ORDER BY ...)`
  * plan a single-partition WindowExec: the ENTIRE input moves through
  * one task (WindowExec itself warns about this). That is not the same
  * thing as a global ORDER — a total order is parallelizable by a
  * range exchange; the single-partition window is not, and at 100× the
  * one task is the query (the round-6 q43 `weak`).
  *
  * Construction here, exact by arithmetic rather than by a sort on one
  * task:
  *   1. range-partition on the total-order key (callers must include a
  *      tiebreak column so the order is total);
  *   2. pin the row→partition map with a REQUIRED stage — both
  *      consumers below must see one assignment, and re-executing the
  *      lineage could re-sample range boundaries between them;
  *   3. per-partition counts → prefix offsets + grand total, computed
  *      as a single-row array fold (O(P²) on P = shuffle-partition
  *      count elements — no window, no driver collect);
  *   4. global rank = partition offset + partition-local row_number (a
  *      window PARTITIONED by pid), broadcast-joining the P-row offset
  *      table back.
  * Every step is partition-parallel; the only data movement is the one
  * range exchange plus the pid-keyed window exchange.
  */
object EquiDepth {

  /** Appends `rankCol` = exact 1-based global rank of each row in the
    * TOTAL order `orderCols`, and `totalCol` = the overall row count
    * (constant column — callers usually drop it after deriving their
    * statistic). */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column],
      rankCol: String, totalCol: String): DataFrame = {
    val nPart = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val ordered = df
      .repartitionByRange(nPart, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val staged = Stage.stageRequired(ordered)
    // offsets: off(p) = Σ cnt(p') for partitions sorted before p
    // (range partition order IS the total order, ascending pid even
    // under DESC sort columns), total = Σ cnt. Empty partitions are
    // simply absent — they contribute zero rows and zero count.
    val offsets = staged.groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("cnt"))
      .agg(array_sort(collect_list(
        struct(col("__gr_pid").as("pid"), col("cnt")))).as("a"))
      .select(explode(expr(
        "transform(a, (x, i) -> struct(x.pid AS pid, " +
          "aggregate(slice(a, 1, i), 0L, (acc, y) -> acc + y.cnt)" +
          " AS off, " +
          "aggregate(a, 0L, (acc, y) -> acc + y.cnt) AS total))"))
        .as("o"))
      .select(col("o.pid").as("__gr_pid"), col("o.off").as("__gr_off"),
        col("o.total").as(totalCol))
    val lw = Window.partitionBy(col("__gr_pid")).orderBy(orderCols: _*)
    staged
      .withColumn("__gr_lr", row_number().over(lw))
      .join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rankCol, col("__gr_off") + col("__gr_lr"))
      .drop("__gr_pid", "__gr_lr", "__gr_off")
  }

  /** Appends `bucketCol` = exactly `ntile(n) OVER (ORDER BY
    * orderCols)`: with q = N div n and rem = N mod n, the first rem
    * buckets take q+1 rows, the rest q — derived arithmetically from
    * the global rank, identical output to the SQL ntile by
    * construction. When N < n every rank lands in branch 1 (rem = N,
    * q = 0) and the q-divisor branch is never evaluated — CASE WHEN
    * is lazy per row, so no division by zero. */
  def ntileExact(df: DataFrame, n: Int, orderCols: Seq[Column],
      bucketCol: String): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val ranked = withGlobalRank(df, orderCols, "__nt_r", "__nt_total")
    val bucket = expr(
      s"""CASE WHEN __nt_r <= (__nt_total % $n) * (__nt_total DIV $n + 1)
         |THEN (__nt_r - 1) DIV (__nt_total DIV $n + 1) + 1
         |ELSE (__nt_total % $n)
         |  + (__nt_r - 1 - (__nt_total % $n) * (__nt_total DIV $n + 1))
         |    DIV (__nt_total DIV $n) + 1
         |END""".stripMargin)
    ranked.withColumn(bucketCol, bucket.cast("long"))
      .drop("__nt_r", "__nt_total")
  }
}
