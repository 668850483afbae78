package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TopicStore

/** A14/A15/A16/A17 — the sink side of the reference's delivery loop:
  *
  *  - `foreachBatch` IS the injected sequence (A14): the user callback
  *    gets the batch; throwing from it vetoes the offset commit
  *    (≙ SET_ROLLBACK_ONLY, PulsarMessageConsumer.java:548-573) and the
  *    batch replays — at-least-once, exactly like nack-and-redeliver.
  *  - Row-level failures (A15 nack): the user marks failed rows; `nack`
  *    re-publishes them to the topic with redelivery_count+1 after the
  *    nack delay — the broker-side redelivery loop, reproduced on the
  *    store. The original message_id is preserved across redeliveries.
  *  - A17 DLQ: a nacked row at redelivery_count ≥ maxRedeliverCount
  *    (default 5) routes to `<topic>-dlq` instead of back onto the topic.
  *
  * Unlike the reference (which learns of mediation failure
  * asynchronously), foreachBatch knows row outcomes synchronously, so
  * routing is immediate — SURVEY.md §3 EP3.
  */
object AckingSink {

  /** Split a processed batch by a failure predicate and route: failures
    * below the DLQ threshold go back to the topic (delayed redelivery);
    * at/above it they go to the DLQ topic. Returns (redelivered, dead)
    * counts. Call from inside foreachBatch. */
  def nack(spark: SparkSession, failed: DataFrame, root: String,
      topic: String, maxRedeliverCount: Int = 5,
      nackDelayMs: Long = 0L, numPartitions: Int = 4): (Long, Long) = {
    val bumped = failed
      .withColumn("redelivery_count", col("redelivery_count") + 1)
      // retry_at rides in properties so the consumer can filter
      // not-yet-due redeliveries without a schema change
      .withColumn("properties", map_concat(
        col("properties"),
        map(lit("retry_at"),
          (unix_millis(current_timestamp()) + nackDelayMs).cast("string"))))
    val dead = bumped.filter(col("redelivery_count") >= maxRedeliverCount)
    val live = bumped.filter(col("redelivery_count") < maxRedeliverCount)
    val deadN = dead.count()
    val liveN = live.count()
    if (deadN > 0)
      TopicStore.publish(spark, dead, root, s"$topic-dlq", numPartitions)
    if (liveN > 0)
      TopicStore.publish(spark, live, root, topic, numPartitions)
    (liveN, deadN)
  }
}
