package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared exact-quantile gating harness for the store-answer queries
  * (q92b reads one batch store; ws14 reads a batch-id-sharded store
  * maintained by a stream). Given the events frame and a bounded
  * (event_type, q, estq) estimates frame read from sketch bytes, it
  * gates the EXACT ceiling-rank order statistics value-for-value and
  * lets the estimate enter only through the within_rank_eps flag —
  * exact values at ranks (q ∓ eps2)·n bracket it iff its rank error
  * is within the (pre-doubled) bound passed by the caller (q72's
  * discipline: KLL compaction is randomized, so the bound is doubled
  * at the call site so a tail draw cannot flip a gated boolean). */
private[queries] object QuantileRankGate {

  /** The (q, numerator, denominator) spine shared by the oracle SQL:
    * rank ⌈qn·n/qd⌉ in exact integer arithmetic (q75: float ceil can
    * round off a binary representation). */
  val ratios: Seq[(Double, Long, Long)] =
    Seq((0.25, 1L, 4L), (0.5, 1L, 2L), (0.9, 9L, 10L))

  def gate(ev: DataFrame, est: DataFrame, eps2: Double): DataFrame = {
    // exact side: per-type ranks + the 9-row (type, q, role) spine
    val ns = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val spine = ns
      .select(col("event_type"), col("n_rows"),
        explode(typedLit(ratios)).as("qi"))
      .select(col("event_type"), col("qi._1").as("q"),
        col("qi._2").as("qn"), col("qi._3").as("qd"), col("n_rows"))
      .select(col("event_type"), col("q"), col("n_rows"),
        explode(array(
          struct(lit("target").as("role"),
            greatest(lit(1L),
              expr("(qn * n_rows + qd - 1) div qd")).as("rk")),
          struct(lit("lo").as("role"),
            greatest(lit(1L), ceil((col("q") - lit(eps2))
              * col("n_rows")).cast("long")).as("rk")),
          struct(lit("hi").as("role"),
            least(col("n_rows"), ceil((col("q") + lit(eps2))
              * col("n_rows")).cast("long")).as("rk")))).as("x"))
      .select(col("event_type"), col("q"), col("n_rows"),
        col("x.role").as("role"), col("x.rk").as("rk"))
    // per-type ranks WITHOUT a type-partitioned window: a
    // bounded-vocab partition key is ONE task per type at 100 TB
    // (the q43 lesson, per-group form). EquiDepth range-ranks the
    // composite (event_type, value, event_id) total order — range
    // exchange + pid-local window at ANY cardinality — and the
    // per-type rank is gr − offset(type), offsets a bounded fold
    // over the per-type counts (type names sort identically in
    // both engines; the composite order groups each type's rows
    // contiguously, so the subtraction is exact).
    val ranked0 = graft.operators.EquiDepth.withGlobalRank(
      ev.select(col("event_type"), col("value"), col("event_id")),
      Seq(col("event_type"), col("value"), col("event_id")),
      "gr", "gtot")
    val offs = ns.agg(array_sort(collect_list(
        struct(col("event_type"), col("n_rows")))).as("a"))
      .select(explode(expr(
        """transform(a, (x, i) -> struct(x.event_type AS event_type,
          |  aggregate(slice(a, 1, i), 0L, (acc, y) -> acc + y.n_rows)
          |  AS off))""".stripMargin)).as("o"))
      .select(col("o.event_type").as("event_type"),
        col("o.off").as("off"))
    val ranked = ranked0.join(broadcast(offs), Seq("event_type"))
      .withColumn("r", col("gr") - col("off"))
    ranked
      .join(broadcast(spine),
        col("r") === col("rk") &&
        ranked("event_type") === spine("event_type"))
      .groupBy(ranked("event_type").as("event_type"), col("q"))
      .agg(max(col("n_rows")).as("n"),
        max(when(col("role") === "target", col("value")))
          .as("value"),
        max(when(col("role") === "lo", col("value"))).as("v_lo"),
        max(when(col("role") === "hi", col("value"))).as("v_hi"))
      .join(est, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"), col("value"),
        (col("estq") >= col("v_lo") && col("estq") <= col("v_hi"))
          .as("within_rank_eps"))
      .orderBy(col("event_type"), col("q"))
  }
}
