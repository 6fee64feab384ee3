package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import graft.streaming.EventStreams.closedUserSessions
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(minutes * 60000)

  private def runStream(stream: MemoryStream[Event],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode, name: String): Unit = {
    val q = transform(stream.toDF())
      .writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling windowed counts accumulate per window and type") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 1, "view", 3.0))
    val q = hourlyTypeCounts(stream.toDF())
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("tumbling").start()
    q.processAllAvailable()
    stream.addData(Event(4, ts(15), 1, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT event_type, n FROM tumbling")
      .as[(String, Long)].collect().toMap
    assert(out("click") === 3L) // incremental batch folded into hour-0 window
    assert(out("view") === 1L)
  }

  test("watermark drops events later than the bound (append mode)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = hourlyTypeCounts(stream.toDF(), watermark = "30 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm").start()
    // batch 1: hour-0 data, then advance event time far ahead
    stream.addData(Event(1, ts(5), 1, "click", 1.0))
    q.processAllAvailable()
    stream.addData(Event(2, ts(300), 1, "click", 1.0)) // watermark → 270 min
    q.processAllAvailable()
    // batch 3: a straggler in hour 0, far behind the watermark → dropped
    stream.addData(Event(3, ts(6), 1, "click", 100.0))
    q.processAllAvailable()
    // hour-0 window closed with only the on-time event
    val hour0 = spark.sql("SELECT n FROM wm WHERE wstart = timestamp'1970-01-01 00:00:00'")
      .as[Long].collect()
    q.stop()
    assert(hour0.toSeq === Seq(1L))
  }

  test("session windows split on the 10-minute gap") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 1.0),
      Event(3, ts(9), 1, "click", 1.0),  // one session (gaps < 10)
      Event(4, ts(30), 1, "click", 1.0), // new session
      Event(5, ts(2), 2, "view", 1.0))   // other user, own session
    runStream(stream, df => userSessions(df), OutputMode.Complete(), "sessions")
    val out = spark.sql("SELECT user_id, n FROM sessions ORDER BY user_id, n")
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L), (1L, 3L), (2L, 1L)))
  }

  test("flatMapGroupsWithState emits sessions closed by gap or watermark timeout") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = closedUserSessions(stream.toDS(), gapMs = 600000L, watermark = "0 seconds")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("closed_sessions").start()
    // session A: two events, then a later event that closes it by gap.
    // (timeline starts at t=10min: an event at exactly the initial
    // watermark epoch-0 would be discarded as late)
    stream.addData(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(15), 1, "click", 2.0))
    q.processAllAvailable()
    stream.addData(Event(3, ts(60), 1, "click", 4.0)) // 55-min gap → closes A
    q.processAllAvailable()
    // advance watermark far ahead so B times out and closes
    stream.addData(Event(4, ts(600), 2, "view", 8.0))
    q.processAllAvailable()
    stream.addData(Event(5, ts(1200), 2, "view", 16.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT user_id, n, sum_value FROM closed_sessions ORDER BY user_id, n")
      .as[(Long, Long, Double)].collect()
    assert(out.contains((1L, 2L, 3.0))) // session A: events 1+2
    assert(out.exists(r => r._1 == 1L && r._2 == 1L)) // session with event 3 closed by timeout
  }

  test("streaming dropDuplicates with watermark dedupes re-delivered events") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    stream.addData(Event(1, ts(10), 1, "click", 1.0), Event(2, ts(11), 1, "click", 2.0))
    q.processAllAvailable()
    // exactly-once upstream retry: same event ids re-delivered
    stream.addData(Event(1, ts(10), 1, "click", 1.0), Event(3, ts(12), 1, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT event_id FROM dedup_stream").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("stateful running user stats fold incrementally across batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = runningUserStats(stream.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("running").start()
    stream.addData(Event(1, ts(0), 1, "click", 10.0),
      Event(2, ts(1), 1, "click", 20.0))
    q.processAllAvailable()
    stream.addData(Event(3, ts(2), 1, "click", 30.0))
    q.processAllAvailable()
    q.stop()
    // last update row for user 1: n=3, mean=20, std=sqrt(200/3)
    val last = spark.sql("SELECT n, mean, std FROM running")
      .as[(Long, Double, Double)].collect().maxBy(_._1)
    assert(last._1 === 3L)
    assert(math.abs(last._2 - 20.0) < 1e-9)
    assert(math.abs(last._3 - math.sqrt(200.0 / 3)) < 1e-9)
  }
}

/** Stream-stream interval join: purchases joined to the same user's clicks
  * within a bounded look-back window, both sides watermarked — the
  * streaming form of the q47 range join. */
class StreamStreamJoinSpec extends SparkSpec {
  import graft.streaming.EventStreams.Event
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def ts(minutes: Long) = new java.sql.Timestamp(minutes * 60000)

  test("purchases join prior clicks within 15 minutes, per user") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF().select($"event_id".as("click_id"),
      $"user_id".as("c_user"), $"ts".as("c_ts")).withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().select($"event_id".as("purchase_id"),
      $"user_id".as("p_user"), $"ts".as("p_ts")).withWatermark("p_ts", "1 hour")
    val joined = p.join(c,
      $"c_user" === $"p_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 15 MINUTES"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj").start()
    clicks.addData(Event(1, ts(10), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 1.0), Event(3, ts(12), 2, "click", 1.0))
    purchases.addData(Event(10, ts(25), 1, "purchase", 5.0),
      Event(11, ts(60), 2, "purchase", 7.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT purchase_id, click_id FROM ssj")
      .as[(Long, Long)].collect().toSet
    // purchase 10 (t=25) matches clicks at 10 and 20 (within 15 min, same user)
    assert(out === Set((10L, 1L), (10L, 2L)))
  }

  test("stream-static broadcast enrichment joins without shuffling the stream") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "site-A"), (2L, "site-B")).toDF("user_id", "site")
    val stream = MemoryStream[Event]
    val q = graft.streaming.EventStreams
      .enrichWithDim(stream.toDF(), dim, "user_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enrich").start()
    stream.addData(Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 3, "click", 1.0)) // user 3 has no dim row
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT event_id, site FROM enrich")
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("site-A"))
    assert(out(2L) === None) // left-outer keeps unmatched stream rows
  }
}

/** foreachBatch incremental-epoch variant (SURVEY.md §2.9): each micro-batch
  * runs the per-epoch batch pipeline and upserts into an idempotent sink —
  * the rerun-after-crash semantics of README.md:22-27. */
class ForeachBatchSpec extends SparkSpec {
  import graft.streaming.EventStreams.Event
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  test("per-batch pipeline upserts idempotently into the results store") {
    implicit val sc = spark.sqlContext
    val store = scala.collection.concurrent.TrieMap[Long, (Long, Double)]()
    val stream = MemoryStream[Event]
    val q = stream.toDF().writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the "epoch pipeline": aggregate the batch, then idempotent upsert
        batch.groupBy($"user_id")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum($"value").as("s"))
          .as[(Long, Long, Double)].collect()
          .foreach { case (u, n, s) =>
            val (pn, ps) = store.getOrElse(u, (0L, 0.0))
            store(u) = (pn + n, ps + s)
          }
        ()
      }
      .start()
    stream.addData(Event(1, new java.sql.Timestamp(0), 1, "click", 1.0),
      Event(2, new java.sql.Timestamp(1000), 1, "click", 2.0))
    q.processAllAvailable()
    stream.addData(Event(3, new java.sql.Timestamp(2000), 1, "click", 4.0),
      Event(4, new java.sql.Timestamp(3000), 2, "view", 8.0))
    q.processAllAvailable()
    q.stop()
    assert(store(1L) === ((3L, 7.0)))
    assert(store(2L) === ((1L, 8.0)))
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal
  import spark.implicits._

  private val docs = Seq((1L, "hello world of multimodal payloads", 34L),
    (2L, "another longer document with more bytes inside it", 50L),
    (3L, "video-ish payload for frame sampling goes here now", 50L))
    .toDF("doc_id", "text", "n_chars")

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.fromDocuments(docs)
    val row = m.filter($"doc_id" === 1L).head()
    assert(row.getAs[Array[Byte]]("payload").length === 34)
    assert(Seq("image", "audio", "video").contains(row.getAs[String]("media_type")))
  }

  test("feature extraction: fixed-length normalized histogram per row") {
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs), 2)
      .collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9)
      assert(f.n_bytes > 0)
    }
  }

  test("frame sampling emits strided deterministic fingerprints") {
    val m = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(m, 2).as[(Long, Int, Long)].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._2 % 2 == 0))
    val again = Multimodal.frameSample(m, 2).as[(Long, Int, Long)].collect()
    assert(frames.sortBy(f => (f._1, f._2)).toSeq === again.sortBy(f => (f._1, f._2)).toSeq)
  }

  test("PGM codec: binary and ASCII round-trip, comments, 16-bit samples") {
    import graft.multimodal.Codecs
    val px = Array.tabulate(12)(i => (i * 20 % 256) / 255.0)
    val enc = Codecs.encodePgm(4, 3, px)
    val Some((w, h, dec)) = Codecs.decodePgm(enc)
    assert(w === 4 && h === 3)
    // 8-bit quantization: exact for k/255 grid values
    px.zip(dec).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // ASCII P2 with a comment line decodes identically
    val ascii = ("P2\n# a comment\n4 3\n255\n" +
      px.map(v => math.floor(v * 255 + 0.5).toInt).mkString(" "))
      .getBytes("US-ASCII")
    val Some((_, _, dec2)) = Codecs.decodePgm(ascii)
    assert(dec.toSeq === dec2.toSeq)
    // 16-bit maxval path
    val wide = "P5\n2 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x00, (0xff).toByte, (0xff).toByte)
    val Some((_, _, dec3)) = Codecs.decodePgm(wide)
    assert(math.abs(dec3(0) - 0x4000.toDouble / 65535) < 1e-12 && dec3(1) === 1.0)
    assert(Codecs.decodePgm("nope".getBytes).isEmpty)
  }

  test("WAV codec: PCM16 sine round-trips; RMS/peak/ZCR features match") {
    import graft.multimodal.{Codecs, Multimodal}
    val n = 8000 // exactly 1 s, 125 whole cycles at 125 Hz
    val s = Array.tabulate(n)(t => 0.5 * math.sin(2 * math.Pi * 125 * t / 8000.0))
    val enc = Codecs.encodeWav(8000, s)
    val Some((rate, dec)) = Codecs.decodeWav(enc)
    assert(rate === 8000 && dec.length === n)
    // quantizer asymmetry (encode ×32767, decode ÷32768) reaches exactly
    // 1/32768 at |s| = 0.5 — hence ≤, not <
    dec.zip(s).foreach { case (d, o) => assert(math.abs(d - o) <= 1.0 / 32768) }
    val f = Multimodal.features(enc)
    assert(math.abs(f(0) - 1.0) < 1e-9) // duration
    assert(math.abs(f(1) - 0.5 / math.sqrt(2.0)) < 1e-3) // sine RMS = A/√2
    assert(math.abs(f(2) - 0.5) < 1e-3) // peak
    assert(math.abs(f(3) - 2 * 125.0 / 8000) < 1e-3) // 2 crossings per cycle
    assert(Codecs.decodeWav(Array.fill[Byte](64)(1)).isEmpty)
  }

  test("feature dispatch: PGM histogram is over decoded luminance") {
    import graft.multimodal.{Codecs, Multimodal}
    // all-dark image: every pixel lands in histogram bin 0
    val dark = Codecs.encodePgm(8, 8, Array.fill(64)(0.0))
    val f = Multimodal.features(dark)
    assert(f(0) === 1.0 && f.drop(1).forall(_ === 0.0))
  }

  test("resize decodes real PGM payloads: file dimensions win, means hold") {
    import graft.multimodal.{Codecs, Multimodal}
    // 8x4 horizontal gradient encoded as PGM; metadata lies (3x3)
    val px = Array.tabulate(32)(i => (i % 8) / 7.0)
    val m = Seq((7L, "image", Codecs.encodePgm(8, 4, px), 3, 3, 1))
      .toDF("doc_id", "media_type", "payload", "width", "height", "channels")
    val r = Multimodal.resize(m, 2, 2).head()
    // left half mean = mean((0..3)/7), right half = mean((4..7)/7)
    val lm = (0 to 3).map(_ / 7.0).sum / 4
    val rm = (4 to 7).map(_ / 7.0).sum / 4
    // quantization error ≤ 1/255 per pixel
    assert(math.abs(r.pixels(0) - lm) < 1.0 / 255)
    assert(math.abs(r.pixels(1) - rm) < 1.0 / 255)
    assert(math.abs(r.pixels(2) - lm) < 1.0 / 255)
    assert(math.abs(r.pixels(3) - rm) < 1.0 / 255)
  }

  test("resize: area-average resampling preserves the global mean") {
    val resized = Multimodal.resize(Multimodal.fromDocuments(docs), 4, 4)
      .collect()
    assert(resized.length === 3)
    resized.foreach { r =>
      assert(r.pixels.length === 16)
      assert(r.pixels.forall(p => p >= 0.0 && p <= 1.0))
    }
    // downscale of a constant-payload grid is exactly that constant
    val const = Seq((9L, "AAAA", 4L))
      .toDF("doc_id", "text", "n_chars")
    val cr = Multimodal.resize(Multimodal.fromDocuments(const), 2, 2)
      .head()
    assert(cr.pixels.forall(p => math.abs(p - 0x41 / 255.0) < 1e-12))
  }
}
