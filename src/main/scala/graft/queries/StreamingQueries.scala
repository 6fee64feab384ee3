package graft.queries

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import graft.{NamedQuery, Tables}
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Driver-visible Structured Streaming correctness (SURVEY.md §2.9): each
  * query here runs a REAL streaming job — file-source micro-batches over a
  * staged copy of the `events` fixture, stateful event-time aggregation,
  * `foreachBatch` idempotent upsert — to completion, then returns the final
  * upserted table as a batch DataFrame. The oracle is the *batch* SQL over
  * the same rows (q40/q42's), so the hash gate certifies incremental ≡
  * batch end to end, not just "some rows came out".
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

  /** Stage the batch events table as an n-file parquet directory; the file
    * stream source then replays it as n micro-batches (one file per
    * trigger, oldest modification first). Range-partitioned by `ts` so the
    * replay is roughly chronological — realistic, but NOT load-bearing:
    * correctness holds for any file order because nothing can be late. */
  private def stage(s: SparkSession, d: String, nFiles: Int): String = {
    val dir = Files.createTempDirectory("graft_stream_events").toString
    Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .repartitionByRange(nFiles, col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

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

  /** q93: incremental tumbling-window counts ≡ batch q40. The stream runs
    * hourlyTypeCounts (the production transform) in Update mode; every
    * micro-batch upserts its changed groups into a keyed store (the
    * idempotent-sink contract — re-delivered keys overwrite their own
    * slot), and the final store contents are returned. State is keyed by
    * (window, type): bounded by the group count, never by event volume. */
  private val q93 = NamedQuery(
    "q93_incremental_windows",
    (s, d) => {
      import s.implicits._
      val dir = stage(s, d, nFiles = 4)
      // upsert store: (wstart µs, event_type) -> (n, sum). TrieMap for the
      // concurrent foreachBatch writes; size = #groups, a model object.
      val store = TrieMap.empty[(Long, String), (Long, Double)]
      withStatePartitions(s, 8) {
        val q = EventStreams.hourlyTypeCounts(eventStream(s, dir), NeverLate)
          .select(unix_micros(col("wstart")).as("w_us"), col("event_type"),
            col("n"), col("sum_value"))
          .writeStream.outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.as[(Long, String, Long, Double)].collect()
              .foreach { case (w, t, n, sv) => store.put((w, t), (n, sv)) }
            ()
          }
          .start()
        q.awaitTermination()
      }
      store.iterator
        .map { case ((w, t), (n, sv)) => (w, t, n, sv) }.toSeq
        .toDF("w_us", "event_type", "n", "sum_value")
        .select(timestamp_micros(col("w_us")).as("wstart"), col("event_type"),
          col("n"), round(col("sum_value"), 6).as("sum_value"))
    },
    // identical to q40's oracle: the claim IS incremental ≡ batch
    Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
      COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** q94: incremental session windows ≡ batch q42, in APPEND mode — a
    * session row is emitted exactly once, when the event-time watermark
    * passes its close. The fixture is finite, so a single far-future
    * sentinel event (user −1), staged as the chronologically-last file,
    * pushes the final watermark past every real session's close; the
    * sentinel's own session can never close and is additionally filtered.
    * The upsert keyed by (user, session_start) makes re-delivery a no-op. */
  private val q94 = NamedQuery(
    "q94_incremental_sessions",
    (s, d) => {
      import s.implicits._
      val dir = stage(s, d, nFiles = 4)
      val maxTs = Tables.events(s, d).agg(max(unix_micros(col("ts")))).head().getLong(0)
      // sentinel: beyond max ts + watermark delay + gap, with margin
      val sentinelUs = maxTs + (3651L * 86400 + 86400) * 1000000L
      // stage it strictly after the data files so the oldest-first file
      // source delivers it in the final micro-batch (mod-time ordering;
      // local filesystems stamp at ms-or-finer granularity, so a 250 ms
      // gap guarantees strict ordering)
      Thread.sleep(250)
      Seq((-1L, sentinelUs, -1L, "sentinel", 0.0))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("append").parquet(dir)
      val store = TrieMap.empty[(Long, Long), (Long, Long, Double)]
      withStatePartitions(s, 8) {
        val q = EventStreams.userSessions(eventStream(s, dir),
            gap = "10 minutes", watermark = NeverLate)
          .select(col("user_id"), unix_micros(col("session_start")).as("s_us"),
            unix_micros(col("session_end")).as("e_us"), col("n"), col("sum_value"))
          .writeStream.outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.as[(Long, Long, Long, Long, Double)].collect()
              .foreach { case (u, st, en, n, sv) =>
                store.put((u, st), (en, n, sv)) }
            ()
          }
          .start()
        q.awaitTermination()
      }
      store.iterator
        .filter { case ((u, _), _) => u >= 0 }
        .map { case ((u, st), (en, n, sv)) => (u, st, en, n, sv) }.toSeq
        .toDF("user_id", "s_us", "e_us", "n", "sum_value")
        .select(col("user_id"),
          timestamp_micros(col("s_us")).as("session_start"),
          timestamp_micros(col("e_us")).as("session_end"), col("n"),
          round(col("sum_value"), 6).as("sum_value"))
    },
    // q42's gaps-and-islands oracle verbatim: incremental ≡ batch
    Some("""WITH e AS (
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
      FROM g GROUP BY user_id, sess"""))

  val all: Seq[NamedQuery] = Seq(q93, q94)
}
