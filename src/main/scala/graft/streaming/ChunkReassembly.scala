package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A19 — chunked-message reassembly (reference:
  * PulsarMessageConsumer.java:325-336, delegated there to pulsar-client):
  * large messages split into chunks arrive out of order; buffer per
  * chunk-uuid, emit when all `total_chunks` fragments are present, expire
  * incomplete groups once the watermark passes last-arrival + `expiry`
  * (≙ expiryTimeOfIncompleteChunkedMessageMillis), and drop groups that
  * exceed `maxChunks` buffered fragments (≙ maxPendingChunkedMessage
  * state cap).
  *
  * Implemented on flatMapGroupsWithState with EventTimeTimeout (public
  * stateful API — SURVEY.md §4: no Catalyst internals). Event-time expiry
  * (vs the reference's wall-clock) is the Spark-idiomatic choice: it is
  * deterministic under replay, which wall-clock expiry is not.
  * (ProcessingTimeTimeout also hits a planner NPE in Spark 4.1.2.)
  *
  * Scale posture: state is shuffled by chunk_uuid, so memory scales with
  * in-flight chunked messages per executor, not corpus size; the
  * watermark bounds state lifetime.
  */
object ChunkReassembly {

  final case class Chunk(
      chunk_uuid: String, chunk_id: Int, total_chunks: Int,
      fragment: String, ts: Timestamp)

  final case class Assembled(
      chunk_uuid: String, payload: String, n_chunks: Int)

  final case class ChunkState(total: Int, fragments: Map[Int, String],
      maxTsMs: Long = 0L)

  /** Knobs taken from the validated source config (A19:
    * expiryTimeOfIncompleteChunkedMessageMillis / maxPendingChunkedMessage).
    * `chunkExpiryWallClock=true` selects the reference's wall-clock expiry
    * semantics (transformWithState, RocksDB store); default stays
    * event-time (deterministic under replay). */
  def reassemble(spark: SparkSession, chunks: Dataset[Chunk],
      conf: graft.model.PulsarLikeConf): Dataset[Assembled] = {
    val expiryMs = conf.chunking
      .expiryTimeOfIncompleteChunkedMessageMillis.getOrElse(60000L)
    val maxChunks = conf.chunking
      .maxPendingChunkedMessage.map(_.toInt).getOrElse(64)
    if (conf.chunking.expiryWallClock)
      reassembleWallClock(spark, chunks, expiryMs, maxChunks)
    else reassemble(spark, chunks, expiryMs = expiryMs, maxChunks = maxChunks)
  }

  /** @param watermarkDelay max out-of-orderness of chunk arrival
    * @param expiryMs incomplete-group expiry measured in event time */
  def reassemble(spark: SparkSession, chunks: Dataset[Chunk],
      watermarkDelay: String = "10 seconds",
      expiryMs: Long = 60000L, maxChunks: Int = 64): Dataset[Assembled] = {
    import spark.implicits._
    chunks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.chunk_uuid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uuid: String, it: Iterator[Chunk], state: GroupState[ChunkState]) => {
          if (state.hasTimedOut) {
            // expiry of an incomplete chunked message: drop buffered state
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq
            val prev = state.getOption
            val all = prev.map(_.fragments).getOrElse(Map.empty) ++
              batch.map(c => c.chunk_id -> c.fragment)
            val expected = batch.headOption.map(_.total_chunks)
              .orElse(prev.map(_.total))
              .getOrElse(0)
            if (all.size > maxChunks) {
              // state cap: drop the oversized group entirely
              state.remove()
              Iterator.empty
            } else if (expected > 0 && all.size == expected &&
                (0 until expected).forall(all.contains)) {
              state.remove()
              Iterator.single(Assembled(uuid,
                (0 until expected).map(all).mkString, expected))
            } else {
              // expiry anchored to the latest fragment's EVENT time (not
              // the watermark: in the first batch the watermark is still
              // 0/epoch, and a timeout derived from it would be wiped as
              // already-expired the moment real timestamps advance it).
              // The max rides in state so an OUT-OF-ORDER late fragment
              // can never move the deadline BACKWARD and prematurely
              // expire an active group — the operator's whole premise is
              // out-of-order arrival within the watermark delay.
              val lastTs = math.max(batch.map(_.ts.getTime).max,
                prev.map(_.maxTsMs).getOrElse(0L))
              state.update(ChunkState(expected, all, lastTs))
              state.setTimeoutTimestamp(
                math.max(lastTs + expiryMs, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
        })
  }

  /** Group metadata: expected fragment count + the processing-time of
    * the last arrival (the stale-timer guard). Fragments themselves live
    * in a MapState — the state encoder supports scalar/product values,
    * and per-fragment map entries mean an arrival writes one entry, not
    * the whole buffer. */
  final case class WallMeta(total: Int, lastSeenMs: Long)

  /** A19 with the reference's WALL-CLOCK expiry semantics
    * (expiryTimeOfIncompleteChunkedMessageMillis is processing-time in
    * pulsar-client): arbitrary-state v2 (`transformWithState`,
    * requires the RocksDB state store provider) with a processing-time
    * timer per group. Each arrival re-arms the deadline by registering a
    * new timer; an expired timer only clears state if the group has been
    * quiet for the full expiry (older timers are recognized as stale
    * against `lastSeenMs`). Non-deterministic under replay by nature —
    * which is why event-time expiry stays the default. */
  def reassembleWallClock(spark: SparkSession, chunks: Dataset[Chunk],
      expiryMs: Long = 60000L, maxChunks: Int = 64): Dataset[Assembled] = {
    import spark.implicits._
    chunks
      .groupByKey(_.chunk_uuid)
      .transformWithState(new WallClockReassembler(expiryMs, maxChunks),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  class WallClockReassembler(expiryMs: Long, maxChunks: Int)
      extends StatefulProcessor[String, Chunk, Assembled] {
    @transient private var meta: ValueState[WallMeta] = _
    @transient private var fragments: MapState[Int, String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      meta = getHandle.getValueState[WallMeta]("meta",
        Encoders.product[WallMeta], TTLConfig.NONE)
      fragments = getHandle.getMapState[Int, String]("fragments",
        Encoders.scalaInt, Encoders.STRING, TTLConfig.NONE)
    }

    private def drop(): Unit = { meta.clear(); fragments.clear() }

    override def handleInputRows(uuid: String, rows: Iterator[Chunk],
        timerValues: TimerValues): Iterator[Assembled] = {
      val batch = rows.toSeq
      val prev = if (meta.exists()) Some(meta.get()) else None
      batch.foreach(c => fragments.updateValue(c.chunk_id, c.fragment))
      val expected = batch.headOption.map(_.total_chunks)
        .orElse(prev.map(_.total)).getOrElse(0)
      val have = fragments.keys().size
      if (have > maxChunks) {
        drop()
        Iterator.empty
      } else if (expected > 0 && have == expected &&
          (0 until expected).forall(fragments.containsKey)) {
        val payload = (0 until expected).map(fragments.getValue).mkString
        drop()
        Iterator.single(Assembled(uuid, payload, expected))
      } else {
        val now = timerValues.getCurrentProcessingTimeInMs()
        meta.update(WallMeta(expected, now))
        getHandle.registerTimer(now + expiryMs)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(uuid: String, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Assembled] = {
      // a fragment arriving after this timer was armed re-armed the
      // deadline — only expire when the group stayed quiet the full window
      if (meta.exists() &&
          expired.getExpiryTimeInMs() >= meta.get().lastSeenMs + expiryMs)
        drop()
      Iterator.empty
    }
  }
}
