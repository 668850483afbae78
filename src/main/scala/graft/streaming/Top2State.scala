package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Input row for the ws07 gate: one consumed event. */
final case class TwsEvent(user_id: Long, value: Double, event_id: Long)

/** Per-key state: the two largest (value, event_id) pairs seen so far
  * (`n` = how many are populated; v2/e2 are meaningful only at n=2). */
final case class Top2State(v1: Double, e1: Long, n: Int, v2: Double, e2: Long)

/** Output: the key's current top-2 after this batch's rows. */
final case class Top2Out(user_id: Long, v1: Double, e1: Long,
    v2: Option[Double], e2: Option[Long])

/** Arbitrary-state streaming via the Spark 4.x `transformWithState`
  * API (the successor to flatMapGroupsWithState, RocksDB-backed):
  * maintains each user's two largest purchase values as a ValueState,
  * merged deterministically whatever the arrival order — the ordering
  * is the total order (value DESC, event_id ASC), so the fold is a
  * commutative set-max and replays/redeliveries cannot change the
  * result. One output row per key per batch that touched it (update
  * mode); state survives across restarts through the checkpoint, which
  * the ws07 gate proves by feeding two disjoint halves in two separate
  * AvailableNow passes. */
final class Top2Processor extends StatefulProcessor[Long, TwsEvent, Top2Out] {

  @transient private var st: ValueState[Top2State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Top2State]("top2",
      Encoders.product[Top2State], TTLConfig.NONE)

  // total order: larger value wins; equal values to the lower event_id
  private def better(av: Double, ae: Long, bv: Double, be: Long): Boolean =
    av > bv || (av == bv && ae < be)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      timers: TimerValues): Iterator[Top2Out] = {
    var cur = if (st.exists()) st.get() else Top2State(0d, 0L, 0, 0d, 0L)
    rows.foreach { r =>
      cur =
        if (cur.n == 0) Top2State(r.value, r.event_id, 1, 0d, 0L)
        else if (better(r.value, r.event_id, cur.v1, cur.e1))
          Top2State(r.value, r.event_id, 2, cur.v1, cur.e1)
        else if (cur.n == 1 || better(r.value, r.event_id, cur.v2, cur.e2))
          Top2State(cur.v1, cur.e1, 2, r.value, r.event_id)
        else cur
    }
    st.update(cur)
    Iterator.single(Top2Out(key, cur.v1, cur.e1,
      if (cur.n == 2) Some(cur.v2) else None,
      if (cur.n == 2) Some(cur.e2) else None))
  }
}
