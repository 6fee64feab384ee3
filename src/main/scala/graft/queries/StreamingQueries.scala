package graft.queries

import scala.collection.concurrent.TrieMap

import graft.{NamedQuery, Tables, TempDirs}
import graft.streaming.{EventStreams, KeyedParquetSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Driver-visible Structured Streaming correctness (SURVEY.md §2.9): each
  * query here runs a REAL streaming job — file-source micro-batches over a
  * staged copy of the `events` fixture, stateful event-time aggregation,
  * `foreachBatch` idempotent upsert into a keyed parquet table
  * ([[KeyedParquetSink]]: O(batch) commits, distributed read-back — the
  * scale path, not a driver map) — to completion, then returns the upserted
  * table as a batch DataFrame. The oracle is the *batch* SQL over the same
  * rows, so the hash gate certifies incremental ≡ batch end to end, not
  * just "some rows came out".
  *
  * Watermark note: these harness runs use an effectively-unbounded watermark
  * delay so that no fixture row is ever dropped regardless of file arrival
  * order — the equivalence being certified is exact. Late-data *dropping*
  * (tight watermarks) is exercised in the MemoryStream ScalaTests
  * (EventStreamsSpec); a production deployment would bound state with the
  * defaults in [[EventStreams]].
  */
object StreamingQueries {

  /** Replay horizon: far longer than any fixture's event-time span, so the
    * watermark never overtakes in-flight files. */
  private val NeverLate = "3650 days"

  /** Staged replay directories, one per (session, dataset, variant): the
    * fixture copy is immutable once staged, so repeated verify/bench runs
    * replay the same files instead of re-copying (and re-sleeping for the
    * sentinel's mod-time gap). All directories die with the JVM
    * ([[TempDirs]]). */
  private val staged = TrieMap.empty[(Int, String, String), String]

  /** Data files (not `_SUCCESS`/hidden) currently in a staged directory. */
  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq.filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  /** Stamp every data file in `dir` that is not in `before` with an
    * explicit whole-second modification time strictly later than every
    * `before` file (and strictly increasing within the new set). The file
    * source orders micro-batches by mod-time; a `Thread.sleep` gap is not
    * enough on filesystems with 1-second mtime granularity, where both
    * writes can land in the same second and the "later" copy silently
    * collapses into the same micro-batch as the original. */
  private def stampAfter(dir: String, before: Seq[java.io.File]): Unit = {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    val beforeNames = before.map(_.getName).toSet
    val base = before.map(_.lastModified()).max / 1000 + 1
    dataFiles(dir).filterNot(f => beforeNames(f.getName)).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        Files.setLastModifiedTime(f.toPath,
          FileTime.fromMillis((base + 1 + i) * 1000L))
      }
  }

  /** Stage the batch events table as an n-file parquet directory; the file
    * stream source then replays it as n micro-batches (one file per
    * trigger, oldest modification first). Range-partitioned by `ts` so the
    * replay is roughly chronological — realistic, but NOT load-bearing:
    * correctness holds for any file order because nothing can be late. */
  private def stage(s: SparkSession, d: String, nFiles: Int): String =
    staged.getOrElseUpdate((System.identityHashCode(s), d, s"plain-$nFiles"), {
      val dir = TempDirs.create("graft_stream_events")
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(dir)
      dir
    })

  /** As [[stage]], plus a far-future sentinel event (user −1) staged as the
    * chronologically-last file: the fixture is finite, so the sentinel
    * pushes the final watermark past every real session's close. Its own
    * session can never close and is filtered by consumers. */
  private def stageWithSentinel(s: SparkSession, d: String, nFiles: Int): String =
    staged.getOrElseUpdate((System.identityHashCode(s), d, s"sentinel-$nFiles"), {
      import s.implicits._
      val dir = TempDirs.create("graft_stream_events_sentinel")
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(dir)
      val maxTs = Tables.events(s, d).agg(max(unix_micros(col("ts"))))
        .head().getLong(0)
      // beyond max ts + watermark delay + gap, with margin
      val sentinelUs = maxTs + (3651L * 86400 + 86400) * 1000000L
      // strictly after the data files so the oldest-first file source
      // delivers it in the final micro-batch (mod-time ordering, made
      // explicit below — no reliance on filesystem timestamp granularity)
      val before = dataFiles(dir)
      Seq((-1L, sentinelUs, -1L, "sentinel", 0.0))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("append").parquet(dir)
      stampAfter(dir, before)
      dir
    })

  /** As [[stage]], but the fixture is written TWICE (second copy in later
    * files by mod-time), so the replay delivers every event again in later
    * micro-batches — the duplicate-arrival shape streaming dedup must
    * absorb across batch boundaries. */
  private def stageDuplicated(s: SparkSession, d: String, nFiles: Int): String =
    staged.getOrElseUpdate((System.identityHashCode(s), d, s"dup-$nFiles"), {
      val dir = TempDirs.create("graft_stream_events_dup")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
      ev.repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(dir)
      val before = dataFiles(dir)
      ev.repartitionByRange(nFiles, col("ts"))
        .write.mode("append").parquet(dir)
      // explicit strictly-later mod-times: the replayed copy must arrive in
      // LATER micro-batches than the originals, or q124 degrades from
      // cross-batch dedup-state coverage to a plain within-batch distinct
      stampAfter(dir, before)
      dir
    })

  private def eventStream(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** State-partition sizing: streaming state shards by
    * spark.sql.shuffle.partitions AT QUERY START, and every micro-batch
    * pays a state-store commit per shard. The fixture's key cardinality
    * (thousands) wants far fewer shards than the session's CPU-count
    * setting — a real deployment sizes state partitions by key volume,
    * not cores. Temporarily lower the conf for the stream, restore
    * after (queries run sequentially in the driver harness). */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Run a streaming DataFrame to completion (AvailableNow), upserting
    * every micro-batch into a fresh keyed parquet sink; returns the sink's
    * final contents. */
  private def runToSink(s: SparkSession, out: DataFrame, mode: OutputMode,
      keys: Seq[String]): DataFrame = {
    val sinkDir = TempDirs.create("graft_stream_sink")
    val q = out.writeStream.outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        KeyedParquetSink.upsertBatch(batch, bid, sinkDir)
      }
      .start()
    q.awaitTermination()
    KeyedParquetSink.read(s, sinkDir, keys)
  }

  /** q93: incremental tumbling-window counts ≡ batch q40. The stream runs
    * hourlyTypeCounts (the production transform) in Update mode; every
    * micro-batch upserts its changed groups into the keyed sink, and the
    * final table is returned. Sink keys are (window, type): bounded by the
    * group count, never by event volume. */
  private val q93 = NamedQuery(
    "q93_incremental_windows",
    (s, d) => {
      val dir = stage(s, d, nFiles = 4)
      withStatePartitions(s, 8) {
        val out = EventStreams.hourlyTypeCounts(eventStream(s, dir), NeverLate)
          .select(unix_micros(col("wstart")).as("w_us"), col("event_type"),
            col("n"), col("sum_value"))
        runToSink(s, out, OutputMode.Update(), Seq("w_us", "event_type"))
      }
        .select(timestamp_micros(col("w_us")).as("wstart"), col("event_type"),
          col("n"), round(col("sum_value"), 6).as("sum_value"))
    },
    // identical to q40's oracle: the claim IS incremental ≡ batch
    Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
      COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** The q42 gaps-and-islands batch oracle: shared by q94 (session_window)
    * and q113 (hand-rolled flatMapGroupsWithState sessionization) — both
    * must reproduce the batch sessions exactly. */
  private val SessionOracle = """WITH e AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 600000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM e)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 10 MINUTE AS session_end,
        COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM g GROUP BY user_id, sess"""

  private def sessionResult(table: DataFrame): DataFrame = table
    .filter(col("user_id") >= 0) // drop the sentinel's never-closing user
    .select(col("user_id"),
      timestamp_micros(col("s_us")).as("session_start"),
      timestamp_micros(col("e_us")).as("session_end"), col("n"),
      round(col("sum_value"), 6).as("sum_value"))

  /** q94: incremental session windows ≡ batch q42, in APPEND mode — a
    * session row is emitted exactly once, when the event-time watermark
    * passes its close (the sentinel file pushes the final watermark past
    * every real close). The upsert keyed by (user, session_start) makes
    * re-delivery a no-op. */
  private val q94 = NamedQuery(
    "q94_incremental_sessions",
    (s, d) => {
      val dir = stageWithSentinel(s, d, nFiles = 4)
      val table = withStatePartitions(s, 8) {
        val out = EventStreams.userSessions(eventStream(s, dir),
            gap = "10 minutes", watermark = NeverLate)
          .select(col("user_id"), unix_micros(col("session_start")).as("s_us"),
            unix_micros(col("session_end")).as("e_us"), col("n"),
            col("sum_value"))
        runToSink(s, out, OutputMode.Append(), Seq("user_id", "s_us"))
      }
      sessionResult(table)
    },
    Some(SessionOracle))

  /** q113: the CUSTOM-STATE sessionizer (flatMapGroupsWithState with
    * event-time timeouts, §2.11) under the same file-replay hash gate as
    * q94 — the hand-rolled operator must reproduce the batch sessions
    * exactly, closed either by an in-stream gap break or by its state
    * timeout when the sentinel advances the watermark. */
  private val q113 = NamedQuery(
    "q113_incremental_custom_sessions",
    (s, d) => {
      import s.implicits._
      val dir = stageWithSentinel(s, d, nFiles = 4)
      val table = withStatePartitions(s, 8) {
        val out = EventStreams.closedUserSessions(
            eventStream(s, dir).as[EventStreams.Event],
            gapMs = 600000L, watermark = NeverLate)
          .toDF()
          .select(col("user_id"), unix_micros(col("session_start")).as("s_us"),
            unix_micros(col("session_end")).as("e_us"), col("n"),
            col("sum_value"))
        runToSink(s, out, OutputMode.Append(), Seq("user_id", "s_us"))
      }
      sessionResult(table)
    },
    Some(SessionOracle))

  /** q114: running per-user Welford statistics (mapGroupsWithState, §2.11)
    * ≡ batch moments. Update mode: each batch re-emits the keys it
    * touched; the sink's final row per user is the state after the last
    * fold, which must equal the one-pass batch aggregate. The certified
    * first moment is the SUM, not the mean: the fixture's dyadic values
    * make many per-user means land exactly on 6-dp rounding boundaries
    * (x/2⁷ decimals), where a 1-ulp accumulation-order difference flips
    * the rounded digit — the sum stays far from boundaries. */
  private val q114 = NamedQuery(
    "q114_incremental_running_stats",
    (s, d) => {
      import s.implicits._
      val dir = stage(s, d, nFiles = 4)
      val table = withStatePartitions(s, 8) {
        val out = EventStreams.runningUserStats(
          eventStream(s, dir).as[EventStreams.Event]).toDF()
        runToSink(s, out, OutputMode.Update(), Seq("user_id"))
      }
      table.select(col("user_id"), col("n"),
        round(col("sum_value"), 6).as("sum_value"),
        round(col("std"), 6).as("std"))
    },
    Some("""SELECT user_id, COUNT(*) AS n,
      ROUND(SUM(value), 6) AS sum_value,
      ROUND(STDDEV_POP(value), 6) AS std
      FROM events GROUP BY user_id"""))

  /** q123: STREAM-STREAM interval join ≡ batch range join, under the hash
    * gate. Purchases and clicks replay as two independent file streams off
    * the same staged fixture; the inner interval join (same user, click
    * within the 30-minute look-back) emits each match exactly once as
    * both sides arrive — with the unbounded harness watermark no state is
    * evicted, so the final sink equals the batch join REGARDLESS of file
    * arrival order. Sink keyed by (purchase_id, click_id): idempotent
    * redelivery. */
  private val q123 = NamedQuery(
    "q123_stream_stream_interval_join",
    (s, d) => {
      val dir = stage(s, d, nFiles = 4)
      val table = withStatePartitions(s, 8) {
        val c = eventStream(s, dir).filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", NeverLate)
        val p = eventStream(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
          .withWatermark("p_ts", NeverLate)
        val joined = p.join(c,
          col("c_user") === col("p_user") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
          .select(col("purchase_id"), col("click_id"),
            col("p_user").as("user_id"),
            unix_micros(col("p_ts")).as("p_us"),
            unix_micros(col("c_ts")).as("c_us"), col("value"))
        runToSink(s, joined, OutputMode.Append(),
          Seq("purchase_id", "click_id"))
      }
      table.select(col("purchase_id"), col("click_id"), col("user_id"),
        timestamp_micros(col("p_us")).as("p_ts"),
        timestamp_micros(col("c_us")).as("c_ts"),
        round(col("value"), 6).as("value"))
    },
    Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        p.user_id, p.ts AS p_ts, c.ts AS c_ts, ROUND(p.value, 6) AS value
      FROM events p JOIN events c
        ON c.user_id = p.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 30 MINUTE"""))

  /** q124: STREAMING DEDUP ≡ batch DISTINCT under the hash gate. The
    * staged replay delivers every event twice (second copy in later
    * micro-batches), and watermarked dropDuplicates must emit each
    * event_id exactly once — cross-batch dedup state, not within-batch
    * distinct. Final sink = the events table itself. */
  private val q124 = NamedQuery(
    "q124_streaming_dedup",
    (s, d) => {
      val dir = stageDuplicated(s, d, nFiles = 4)
      val table = withStatePartitions(s, 8) {
        val out = eventStream(s, dir)
          .withWatermark("ts", NeverLate)
          .dropDuplicates("event_id")
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
        runToSink(s, out, OutputMode.Append(), Seq("event_id"))
      }
      table.select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"),
        round(col("value"), 6).as("value"))
    },
    Some("""SELECT event_id, ts, user_id, event_type,
      ROUND(value, 6) AS value FROM events"""))

  val all: Seq[NamedQuery] = Seq(q93, q94, q113, q114, q123, q124)
}
