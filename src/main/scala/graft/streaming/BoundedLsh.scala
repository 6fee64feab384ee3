package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Event-time-bounded bucket state for STREAMING MinHash-LSH near-dup —
  * the state lifecycle q169's unbounded form leaves open: a
  * continuously-ingesting service cannot hold every document ever seen
  * in its LSH index, so bucket membership lives inside a retention
  * horizon defined by the stream's watermark. Two mechanisms, one
  * semantic:
  *
  *   - LAZY EVICTION on access ([[retain]]): when a bucket receives new
  *     members, anything older than the current watermark leaves before
  *     pairing — so an arrival pairs only against partners inside the
  *     horizon, and the emitted candidate set is exactly "same bucket,
  *     co-resident within the horizon".
  *   - TIMEOUT CLEANUP: each update arms an event-time timeout one
  *     horizon past the bucket's newest member; a bucket silent past
  *     that point is deleted wholesale ([[GroupState.remove]]), so state
  *     size is bounded by the horizon's arrival volume, never by corpus
  *     history. StreamingQueriesSpec asserts the bound via the state
  *     operator's numRowsTotal.
  *
  * Recall impact (documented, by design): a true near-dup pair whose
  * members arrive further apart than the horizon is NOT discovered —
  * that is the deliberate trade a bounded index makes, and q169b's
  * oracle states it exactly (pairs restricted to adjacent "days").
  */
object BoundedLsh {

  /** One bucket member: (doc id, event-time millis). */
  type Member = (Long, Long)

  /** Timeout slack past a bucket's newest member: one fixture "day".
    * Must exceed zero so the armed timeout stays ahead of the watermark;
    * the EVICTION horizon itself is set by the stream's watermark delay,
    * not by this constant. */
  val TimeoutSlackMs: Long = 86400000L

  /** Members still inside the horizon at watermark `wm` (kept iff their
    * event time is at or after it — the watermark IS the horizon edge). */
  def retain(members: Seq[Member], wm: Long): Seq[Member] =
    members.filter(_._2 >= wm)

  /** The flatMapGroupsWithState function (EventTimeTimeout, Append):
    * rows are (doc_id, band, band_sig, ts) keyed by (band, band_sig);
    * each NEW member emits one candidate pair against every retained
    * earlier member plus earlier same-batch arrivals (ascending id), so
    * every within-horizon bucket pair is emitted exactly once regardless
    * of how the corpus splits into micro-batches. */
  def onBucket(
      key: (Int, Long),
      rows: Iterator[(Long, Int, Long, java.sql.Timestamp)],
      state: GroupState[Seq[Member]]): Iterator[(Long, Long)] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val wm = state.getCurrentWatermarkMs()
      val arrivedTs = rows.map(r => (r._1, r._4.getTime)).toSeq
        .groupMapReduce(_._1)(_._2)(math.max)
      // a re-delivered member is not a new pair source, but it IS fresh
      // evidence of recency: refresh its stored event time so its
      // horizon runs from last-seen, not first-seen (otherwise a doc
      // seen yesterday AND today would be evicted as if it were stale)
      val prior = retain(state.getOption.getOrElse(Seq.empty), wm)
        .map { case (mid, ts) => (mid, math.max(ts, arrivedTs.getOrElse(mid, ts))) }
      val priorIds = prior.map(_._1).toSet
      val fresh = arrivedTs.toSeq.sortBy(_._1)
        .filterNot(m => priorIds(m._1))
      val retained = prior ++ fresh
      if (retained.isEmpty) { state.remove(); Iterator.empty }
      else {
        state.update(retained)
        state.setTimeoutTimestamp(retained.map(_._2).max + TimeoutSlackMs)
        (for {
          ((bId, _), i) <- fresh.iterator.zipWithIndex
          (aId, _) <- prior.iterator ++ fresh.iterator.take(i)
        } yield (math.min(aId, bId), math.max(aId, bId)))
      }
    }
  }
}
