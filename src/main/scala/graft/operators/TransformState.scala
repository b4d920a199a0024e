package graft.operators

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` — the arbitrary-state API that
  * replaces `mapGroupsWithState` (typed state handles with optional TTL,
  * timers, initial state, and schema-evolvable state encoding). One
  * production-shaped processor proves the surface end to end: per-key
  * running totals held in a single `ValueState`, updated per micro-batch
  * and emitted in Update mode.
  *
  * Notes that matter at scale, learned from the API contract:
  *  - `transformWithState` REQUIRES the RocksDB state-store provider
  *    (the HDFS-backed map provider refuses the operator) — callers
  *    scope `spark.sql.streaming.stateStore.providerClass` around the
  *    query; this is also the provider you actually want for large
  *    state (incremental, constant-memory checkpoints).
  *  - The cents-integer accumulator keeps the emitted totals exact and
  *    order-independent, so the single-batch fixture run hash-matches a
  *    relational oracle (the streaming-vs-batch determinism discipline
  *    used across the `s_*` lane).
  */
object TransformState {
  case class EventIn(user_id: Long, event_id: Long, cents: Long)
  case class AggState(n: Long, cents: Long, minId: Long)
  case class UserTotals(user_id: Long, n_events: Long, cents_sum: Long, min_event: Long)

  class UserTotalsProcessor extends StatefulProcessor[Long, EventIn, UserTotals] {
    @transient private var st: ValueState[AggState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AggState]("totals",
        Encoders.product[AggState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var s = if (st.exists()) st.get() else AggState(0L, 0L, Long.MaxValue)
      rows.foreach { r =>
        s = AggState(s.n + 1L, s.cents + r.cents, math.min(s.minId, r.event_id))
      }
      st.update(s)
      Iterator.single(UserTotals(key, s.n, s.cents, s.minId))
    }
  }
}
