package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The idempotence contract behind every foreachBatch landing: a
  * replayed micro-batch (same batchId, rewritten after a failure
  * between write and offset commit) must not duplicate rows. */
class BatchLandingSpec extends SparkSpec {

  test("replaying a batch overwrites its partition instead of appending") {
    import spark.implicits._
    val out = tmpDir("landing")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    BatchLanding.land(b0, out, 0L)
    BatchLanding.land(b1, out, 1L)
    // replay batch 1 (e.g. driver failed before committing offsets)
    BatchLanding.land(b1, out, 1L)
    val got = BatchLanding.read(spark, out)
    assert(got.count() == 3, got.collect().mkString(","))
    assert(got.columns.toSeq == Seq("id", "v")) // batch_id stripped
    assert(got.select(sum(col("id"))).head().getLong(0) == 6L)
  }

  test("an empty batch lands a readable schema") {
    import spark.implicits._
    val out = tmpDir("landing-empty")
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    BatchLanding.land(empty, out, 0L)
    BatchLanding.land(Seq((9L, "z")).toDF("id", "v"), out, 1L)
    assert(BatchLanding.read(spark, out).count() == 1)
  }
}
