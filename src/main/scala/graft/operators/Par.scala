package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for compute-heavy pipelines (optimization
  * guide §2.5 "input skew: one huge unsplittable file ... repartition
  * immediately after the read").
  *
  * The driver's fixtures land each table as ONE parquet file with ONE
  * row group, so every scan is a single task no matter what
  * `maxPartitionBytes` says — and a pipeline whose cost is per-row
  * compute ABOVE the first exchange (char-n-gram explodes, per-token
  * md5/xxhash, simhash bit math, vector distance sweeps) runs that
  * entire stage on one core while the other 31 idle. Round-11 job
  * profiling measured the single-task stage at 60-95% of wall time on
  * the heavy text/dedup queries (OPTIMIZATION_r11.md).
  *
  * [[fan]] inserts a round-robin repartition to the session's default
  * parallelism — but ONLY when the input's optimizer-estimated size
  * says the scan cannot reach that parallelism on its own
  * (est. partitions = sizeInBytes / maxPartitionBytes < cores). At
  * production scale the condition is false (a 100 TB table scans as
  * ~800k splits) and fan() is the identity: no extra exchange ever
  * reaches a big-data plan. The exchange it does insert locally moves
  * only the raw base rows (KB-MB) once, before the per-row blowup.
  *
  * Row-level results are unchanged: repartition is a pure placement
  * operation, and every gated query's output is partitioning-
  * independent (total ORDER BY / exact aggregation surfaces; the
  * partition-id-sensitive ops — EquiDepth, VectorOps.__rid — pin their
  * own placement and never sit under a fan call).
  */
object Par {
  /** The shared scale guard: true when the optimizer's size estimate
    * says the input cannot reach core-count parallelism on its own
    * (est. partitions = sizeInBytes / maxPartitionBytes < cores).
    * NOTE the estimate runs the analyzer+optimizer over the subtree at
    * CONSTRUCTION time — cheap for the scan-adjacent inputs fan/fanBy
    * are meant for, but a plan with several chained fans re-optimizes
    * overlapping prefixes; guard once per input where helpers chain. */
  private def needsFan(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxPB = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    size < maxPB * cores
  }

  def fan(df: DataFrame): DataFrame =
    if (needsFan(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** Key-preserving variant of [[fan]] for compute-heavy JOIN stages
    * whose shuffled bytes are tiny: AQE's partition coalescing is
    * byte-based (`minPartitionSize`), so a candidate-pair self-join
    * over a few MB of keys collapses to ONE post-shuffle task even
    * though the per-pair work (array intersections, distance math) is
    * the query's dominant cost. `fanBy(df, joinKeys...)` hash-
    * repartitions on the join keys with an explicit partition count
    * (a REPARTITION_BY_NUM exchange, which AQE must not coalesce) —
    * applied to BOTH sides of an equi-join it satisfies the join's
    * required distribution, so it replaces the join's own exchange
    * rather than adding one. Same scale guard as [[fan]]: a side whose
    * estimated size says the scan/shuffle is already parallel passes
    * through untouched, so big-data plans keep AQE's byte-based
    * sizing. */
  def fanBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    if (needsFan(df))
      df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, keys: _*)
    else df
}
