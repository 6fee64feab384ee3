package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9): the reference's
  * epoch-incremental structure as streaming transforms. Every function here
  * takes a (possibly streaming) events DataFrame and returns a transformed
  * one — the same code path serves `readStream` in production and
  * MemoryStream/batch in tests. Watermarks bound state; all aggregations
  * are keyed (window/session/user) so state partitions across executors.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserState(n: Long, mean: Double, m2: Double)

  final case class UserStat(user_id: Long, n: Long, mean: Double, std: Double)

  /** Tumbling 1 h windowed counts per event type with a watermark — late
    * epochs beyond the watermark are dropped (README.md:22-27 rerun
    * semantics → idempotent windowed aggregation). */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))

  /** Stream-static enrichment: join the event stream against a (small)
    * static dimension — the site/filter metadata lookup of the reference's
    * per-epoch headers (p_io.py:54, psf_phot.py:94). The static side is
    * broadcast, so the stream never shuffles and the join adds no state. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Session windows (10 min gap) per user — exposure-burst grouping. */
  def userSessions(events: DataFrame, gap: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_value"))

  final case class OpenSession(start: Timestamp, last: Timestamp, n: Long,
      sum: Double)

  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n: Long, sum_value: Double)

  /** Custom sessionization via flatMapGroupsWithState (§2.11): sessions
    * close when the event-time watermark passes start-of-gap — the
    * hand-rolled analog of session_window, emitting only CLOSED sessions
    * (append semantics). State per user is one open session: O(1). */
  def closedUserSessions(events: Dataset[Event], gapMs: Long = 600000L,
      watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
          if (sorted.isEmpty && state.hasTimedOut) {
            open.foreach { s =>
              closed += ClosedSession(user, s.start,
                new Timestamp(s.last.getTime + gapMs), s.n, s.sum)
            }
            state.remove()
          } else {
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.last.getTime < gapMs =>
                  // out-of-order arrivals within the watermark may precede
                  // the open session: extend bounds monotonically so a late
                  // event can never rewind the session end or split it
                  val start = if (e.ts.before(s.start)) e.ts else s.start
                  val last = if (e.ts.after(s.last)) e.ts else s.last
                  open = Some(OpenSession(start, last, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += ClosedSession(user, s.start,
                    new Timestamp(s.last.getTime + gapMs), s.n, s.sum)
                  open = Some(OpenSession(e.ts, e.ts, 1L, e.value))
                case None =>
                  open = Some(OpenSession(e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
          }
          closed.iterator
      }
  }

  /** Running per-star ensemble statistics across epochs (SURVEY.md §7
    * hard-part 7): Welford mean/variance carried in keyed state via
    * mapGroupsWithState — out-of-order arrivals within a batch are folded
    * in event order; state is O(1) per key. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStat] {
        (user: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, 0.0, 0.0))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n1 = s.n + 1
            val delta = e.value - s.mean
            val mean1 = s.mean + delta / n1
            val m21 = s.m2 + delta * (e.value - mean1)
            s = UserState(n1, mean1, m21)
          }
          state.update(s)
          UserStat(user, s.n, s.mean,
            if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0)
      }
  }
}
