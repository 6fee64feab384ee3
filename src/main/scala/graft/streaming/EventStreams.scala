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

  final case class UserState(n: Long, mean: Double, m2: Double, sum: Double)

  final case class UserStat(user_id: Long, n: Long, mean: Double, std: Double,
      sum_value: Double)

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

  final case class OpenSessions(sessions: Seq[OpenSession])

  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n: Long, sum_value: Double)

  /** Event timestamps carry microseconds; `Timestamp.getTime` is
    * millisecond-granular (the µs remainder lives in the nanos field), so
    * all session arithmetic runs on exact µs to keep emitted bounds
    * bit-equal to the batch oracle's `ts + INTERVAL`. */
  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
  private def tsOfUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Custom sessionization via flatMapGroupsWithState (§2.11): the
    * hand-rolled analog of session_window, emitting only CLOSED sessions
    * (append semantics).
    *
    * State per user is the SET of open sessions, not a single one: within
    * the watermark horizon, micro-batches can arrive out of chronological
    * order (file sources tie-break equal modification times arbitrarily),
    * and a single-open-session fold would merge what are really separate
    * sessions when a later-time batch arrives first. Each batch instead
    * sweep-merges the state sessions with the batch's events by start
    * time (the gap rule is associative over that order, so the merged set
    * is arrival-order-independent), and a session closes only when the
    * event-time watermark passes its end-of-gap — exactly when no event
    * that could still extend it can arrive. State size is bounded by the
    * watermark horizon, as for the built-in session_window. */
  def closedUserSessions(events: Dataset[Event], gapMs: Long = 600000L,
      watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSessions]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val gapUs = gapMs * 1000L
          val protos = state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
            rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
              .map(e => OpenSession(e.ts, e.ts, 1L, e.value))
          val merged = scala.collection.mutable.ArrayBuffer[OpenSession]()
          protos.sortBy(s => (usOf(s.start), usOf(s.last))).foreach { s =>
            merged.lastOption match {
              case Some(prev) if usOf(s.start) - usOf(prev.last) < gapUs =>
                merged(merged.length - 1) = OpenSession(prev.start,
                  if (s.last.after(prev.last)) s.last else prev.last,
                  prev.n + s.n, prev.sum + s.sum)
              case _ => merged += s
            }
          }
          // final once the watermark passes end-of-gap: any event that
          // could extend the session (ts < last + gap) would now be late
          val (closed, open) =
            merged.partition(s => usOf(s.last) + gapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open.toSeq))
            // earliest possible close among surviving sessions, rounded UP
            // to ms so it stays strictly beyond the current watermark
            // (closable sessions just left the set)
            state.setTimeoutTimestamp(
              (open.map(s => usOf(s.last) + gapUs).min + 999L) / 1000L)
          }
          closed.iterator.map(s => ClosedSession(user, s.start,
            tsOfUs(usOf(s.last) + gapUs), s.n, s.sum))
      }
  }

  /** Running per-star ensemble statistics across epochs (SURVEY.md §7
    * hard-part 7): Welford mean/variance carried in keyed state via
    * mapGroupsWithState — out-of-order arrivals within a batch are folded
    * in event order; state is O(1) per key. The state carries the Welford
    * moments (catastrophe-free variance) AND the raw first moment: the
    * emitted mean is sum/n, which agrees with a naive batch average to
    * accumulation-order noise (~1 ulp) — the Welford mean walks a
    * different fp path and can land a full rounding step away from the
    * batch value it is certified against (q114). */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStat] {
        (user: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n1 = s.n + 1
            val delta = e.value - s.mean
            val mean1 = s.mean + delta / n1
            val m21 = s.m2 + delta * (e.value - mean1)
            s = UserState(n1, mean1, m21, s.sum + e.value)
          }
          state.update(s)
          UserStat(user, s.n, if (s.n > 0) s.sum / s.n else 0.0,
            if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0, s.sum)
      }
  }
}
