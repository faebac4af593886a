package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running event totals for the stateful-counts stream. */
case class UserEvent(user_id: Long, value: Double)
case class UserRunning(user_id: Long, n: Long, total: Double)
/** Event-time input / session-close emission for the timer face. */
case class StampedEvent(user_id: Long, ts: java.sql.Timestamp)
case class SessionClose(user_id: Long, n_events: Long, closed_at_ms: Long)

/** Arbitrary keyed state on the `transformWithState` (state v2) API —
  * the Spark 4.x successor to `mapGroupsWithState` (which
  * `EventAggregates.runningTotals` keeps for the closed-session shape):
  * named, independently typed state variables per key (here a count
  * and an exact running total), explicit TTL hooks, and timer support,
  * all backed by the RocksDB state store. This is the engine face a
  * long-running CDC aggregation would use at scale: state lives off
  * the JVM heap, is range-scannable at snapshot time, and each
  * variable evolves independently (adding a third accumulator never
  * rewrites existing state rows — the schema-evolution property
  * `mapGroupsWithState`'s single opaque state object lacks).
  *
  * Emits one updated running row per key per micro-batch (Update mode).
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, UserEvent, UserRunning] {

  @transient private var count: ValueState[Long] = _
  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    total = getHandle.getValueState[Double]("total", Encoders.scalaDouble,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                               timerValues: TimerValues): Iterator[UserRunning] = {
    var n = if (count.exists()) count.get() else 0L
    var t = if (total.exists()) total.get() else 0.0
    rows.foreach { e => n += 1; t += e.value }
    count.update(n)
    total.update(t)
    Iterator.single(UserRunning(key, n, t))
  }
}

/** The TIMER face of state v2: a session closes when the event-time
  * watermark passes (last event + gap) — the processor registers one
  * event-time timer per key, REPLACING it on every new event (delete +
  * register, so a key holds exactly one pending timer), and emits the
  * session's count only from `handleExpiredTimer`. This is the
  * closed-session shape `EventAggregates` pins via
  * `flatMapGroupsWithState` + GroupStateTimeout, re-expressed on the
  * v2 API where the timer is an explicit, per-key-multiplicity-free
  * primitive rather than a single timeout slot fused into the state.
  *
  * The timer only ever moves FORWARD: the per-key max event time lives
  * in state (`maxTs`), and the replacement timer is
  * `max(stored maxTs, this batch's max) + gap`. An out-of-order event
  * inside the watermark lateness allowance that arrives in a LATER
  * micro-batch therefore extends or keeps the close time — it can
  * never pull an already-registered timer earlier and split one
  * session into two (the bug a batch-local max alone produces).
  */
class SessionCloseProcessor(gapMs: Long)
    extends StatefulProcessor[Long, StampedEvent, SessionClose] {

  @transient private var count: ValueState[Long] = _
  @transient private var pendingTimer: ValueState[Long] = _
  @transient private var maxSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    pendingTimer = getHandle.getValueState[Long]("timer", Encoders.scalaLong,
      TTLConfig.NONE)
    maxSeen = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StampedEvent],
                               timerValues: TimerValues): Iterator[SessionClose] = {
    var n = if (count.exists()) count.get() else 0L
    var maxTs = if (maxSeen.exists()) maxSeen.get() else Long.MinValue
    rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
    count.update(n)
    maxSeen.update(maxTs)
    // forward-only replacement: an in-allowance out-of-order event in a
    // later batch must never pull the close time earlier (see scaladoc)
    val timer = maxTs + gapMs
    if (pendingTimer.exists()) {
      if (timer > pendingTimer.get()) {
        getHandle.deleteTimer(pendingTimer.get())
        getHandle.registerTimer(timer)
        pendingTimer.update(timer)
      }
    } else {
      getHandle.registerTimer(timer)
      pendingTimer.update(timer)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
    val n = if (count.exists()) count.get() else 0L
    count.clear()
    pendingTimer.clear()
    maxSeen.clear()
    Iterator.single(SessionClose(key, n, expiredTimerInfo.getExpiryTimeInMs))
  }
}

object StatefulCounts {
  /** transformWithState requires the RocksDB state store provider. */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[UserRunning] = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Timer-closed sessions over event time; `delay` is the watermark
    * lateness allowance, `gapMs` the session gap. */
  def sessionCloses(events: Dataset[StampedEvent], delay: String,
                    gapMs: Long): Dataset[SessionClose] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[SessionClose] = Encoders.product[SessionClose]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
