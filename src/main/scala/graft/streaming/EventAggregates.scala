package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.util.Det._

/** Streaming aggregate surface (SURVEY §2.7 T3-T5 extensions): windowed
  * aggregation with watermarks, session windows, watermark-scoped dedup,
  * and custom keyed state. Every transform is batch/stream agnostic —
  * the same plan runs over `Tables.events` (batch, oracle-checked) and a
  * Kafka/MemoryStream source (streaming, spec-checked), which is the
  * Structured Streaming contract.
  *
  * At scale the watermark is what bounds state: without it a windowed
  * aggregate over an unbounded stream grows state forever; with it,
  * windows older than (max event time − delay) finalize and GC.
  */
object EventAggregates {

  /** T4: tumbling-window counts/sums per event type. Late rows beyond
    * `watermark` are dropped; closed windows leave the state store. */
  def tumblingCounts(events: DataFrame, win: String = "1 day",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** SLIDING windows (win/slide overlap) — each event lands in exactly
    * win/slide epoch-aligned windows (4 at the 1-day/6-hour default),
    * the bounded row multiplier Spark's `window(ts, win, slide)`
    * generates BEFORE the aggregate, so the shuffle carries one partial
    * per (window, type) per partition, never 4× the events. The
    * trend-smoothing face of [[tumblingCounts]]: same watermark/state
    * contract, windows finalize win after their start instead of
    * slide. */
  def slidingCounts(events: DataFrame, win: String = "1 day",
                    slide: String = "6 hours",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** T4: session windows — a session extends while consecutive events per
    * user arrive within `gap`; end = last event + gap. */
  def sessionized(events: DataFrame, gap: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** T3: replay/duplicate suppression bounded by the watermark — the
    * streaming-safe `dropDuplicates` (unbounded-key dedup state would
    * grow forever on an infinite stream). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  /** Open-session state: event times ride as epoch MICROS (Catalyst's
    * native timestamp precision — `Timestamp.getTime` would truncate to
    * millis and drift from the batch oracle), and the running total as
    * exact CENTS (the [[graft.util.Det.dsum]] discipline in keyed-state
    * form — a plain double accumulation would drift from the
    * decimal-summing batch oracle on the second event of any session). */
  case class SessionOpen(start_us: Long, last_us: Long, n: Long, total_cents: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp,
                           n_events: Long, total_value: Double)

  /** T5 extension: CLOSED-session emission via `flatMapGroupsWithState`
    * + event-time timeout — the stateful shape `session_window` cannot
    * express (the built-in aggregate re-emits a session every time it
    * grows; downstream consumers that must see each session exactly
    * once, finalized — billing, session logs — need append-only CLOSED
    * sessions). Per user: events merge into the open session in
    * event-time order; an intra-batch gap > `gap` closes the earlier
    * session immediately; the open session registers an event-time
    * timeout at `last + gap`, so it closes exactly when the WATERMARK
    * passes its gap horizon — state is evicted on close, bounding the
    * store to one open session per active user (idle users' state ages
    * out through the same timeout). End semantics match
    * `session_window`: end = last event + gap. REQUIRES non-null
    * user_id (keyed state needs a key; the Long decode would throw on
    * NULL) — filter or sentinel null-user events upstream, unlike the
    * `session_window` faces, which group NULL users as their own key. */
  def closedSessions(events: DataFrame, gapMs: Long = 3600000L,
                     watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L
    // local defs (not object methods): the state-update closure ships to
    // executors, and capturing the enclosing object would make the task
    // unserializable
    // mirror of Spark's CAST(v AS DECIMAL(18,2)) (and DuckDB's — both
    // round the shortest decimal representation HALF_UP), as cents
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact
    // epoch-micros → Timestamp, micros preserved (the constructor takes
    // millis; setNanos replaces the full fractional second)
    def usTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def close(uid: Long, s: SessionOpen): ClosedSession =
      ClosedSession(uid, usTs(s.start_us), usTs(s.last_us + gapUs),
        s.n, s.total_cents / 100.0)
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        unix_micros(col("ts")).as("us"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[SessionOpen]) =>
          if (state.hasTimedOut) {
            val done = close(uid, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // fold this batch's events in event-time order into the open
            // session; a gap ≥ gapMs closes and emits the earlier one
            val sorted = rows.map(r => (r._3, r._4)).toSeq.sortBy(_._1)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { case (t, v) =>
              open match {
                // STRICT bound: an event at exactly last+gap starts a new
                // session — `session_window` ranges are [start, last+gap),
                // and the two faces must sessionize identically
                case Some(s) if t < s.last_us + gapUs =>
                  open = Some(SessionOpen(s.start_us, math.max(s.last_us, t), s.n + 1,
                    s.total_cents + cents(v)))
                case Some(s) =>
                  closed += close(uid, s)
                  open = Some(SessionOpen(t, t, 1L, cents(v)))
                case None =>
                  open = Some(SessionOpen(t, t, 1L, cents(v)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fires when the watermark passes the session's gap horizon
              // (floor-to-millis can only fire the timer sub-ms EARLY, and
              // any event that could still have joined the session would
              // itself be below that watermark)
              state.setTimeoutTimestamp(Math.floorDiv(s.last_us + gapUs, 1000L))
            }
            closed.result().iterator
          }
      }
  }

  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** T5: custom keyed state via `mapGroupsWithState` — running per-user
    * totals that survive across micro-batches (the
    * `KeyValueGroupedDataset` path for state the built-in windows can't
    * express). Emits the updated total per user per batch. */
  def runningTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotals(uid, prev.n_events + batch.size,
            prev.total_value + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }
}
