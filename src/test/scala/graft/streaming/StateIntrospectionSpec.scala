package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spark 4's state data source (`spark.read.format("statestore")`) over
  * the engine's checkpoints — the ops surface for inspecting a live
  * stateful query's state without stopping it: which windows are open,
  * what a dedup set holds, how big per-key state is. At 100 TB this is
  * how an operator debugs a stuck watermark or a state leak; here it is
  * gated against a known aggregation's state.
  */
object StateIntrospectionSpec {
  case class Ev(userId: Long, t: Timestamp)
}

class StateIntrospectionSpec extends SparkSpec {
  import StateIntrospectionSpec._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("statestore read exposes a windowed aggregation's open windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ckpt = tmpDir("graft-state-ckpt")
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("t", "10 seconds")
      .groupBy(window(col("t"), "1 minute"), col("userId"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("state_wins")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // minute-1 windows (u1 ×2, u2 ×1) and minute-2 windows (u1, u2);
      // after processing, the watermark sits at 140-10=130: minute 1
      // ([60,120)) is finalized → OUTPUT and evicted; minute 2
      // ([120,180)) is still open → STATE
      input.addData(Ev(1L, ts(70)), Ev(1L, ts(75)), Ev(2L, ts(70)),
        Ev(1L, ts(130)), Ev(2L, ts(140)))
      q.processAllAvailable()

      val state = spark.read.format("statestore").load(ckpt)
      // schema: key (the grouping tuple), value (the agg buffer),
      // partition_id
      assert(state.columns.toSeq.contains("key") &&
        state.columns.toSeq.contains("value"), state.columns.mkString(","))
      val open = state
        .select(col("key.window.start").as("ws"), col("key.userId"),
          // the buffer carries the physical agg name, not the query alias
          col("value.count"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)))
        .toSet
      assert(open == Set((120L, 1L, 1L), (120L, 2L, 1L)), open)
      // and the finalized windows left state by being emitted
      val emitted = spark.table("state_wins")
        .select(col("window.start"), col("userId"), col("n"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)))
        .toSet
      assert(emitted == Set((60L, 1L, 2L), (60L, 2L, 1L)), emitted)
    } finally q.stop()
  }

  test("statestore read exposes a dropDuplicates key set") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ckpt = tmpDir("graft-state-ckpt-dd")
    val input = MemoryStream[Ev]
    val dedup = input.toDS().dropDuplicates("userId")
    val q = dedup.writeStream.format("memory").queryName("state_dd")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(Ev(1L, ts(10)), Ev(1L, ts(20)), Ev(7L, ts(30)))
      q.processAllAvailable()
      val keys = spark.read.format("statestore").load(ckpt)
        .select(col("key.userId")).as[Long].collect().toSet
      assert(keys == Set(1L, 7L), keys)
    } finally q.stop()
  }
}
