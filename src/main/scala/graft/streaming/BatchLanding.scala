package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent executor-side landing for `foreachBatch` results.
  *
  * `foreachBatch` + `mode("append")` is only at-least-once: a micro-batch
  * replayed after a failure between the write and the offset commit would
  * append its rows twice. Landing each batch in its own
  * `batch_id=<id>` directory with `mode("overwrite")` makes the replay
  * rewrite identical files instead — the standard foreachBatch
  * idempotence pattern (batchId is stable across replays of the same
  * epoch). Readers strip the partition-discovery column.
  */
object BatchLanding {

  /** Land one micro-batch under `outDir/batch_id=<batchId>`, replacing
    * whatever a failed earlier attempt of the SAME batch left there. */
  def land(df: DataFrame, outDir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Read everything landed under `outDir`, without the synthetic
    * `batch_id` partition column. */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch_id")

  /** Read everything landed under `outDir` KEEPING `batch_id` — an
    * update-mode landing needs latest-batch-wins reconstruction. */
  def readRaw(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
