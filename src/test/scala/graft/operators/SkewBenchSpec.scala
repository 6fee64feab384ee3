package graft.operators

import graft.{SparkSpec, SparkEntry, TempDirs}
import org.apache.spark.sql.functions._

/** Adversarial-SKEW timing: the skew guards (q61's dfCap hot-shingle
  * recount, q121's aggregate-only span path, banded LSH, AQE skew
  * handling on hot group keys) are correctness-tested elsewhere — this
  * spec times them under PLANTED skew and asserts the runtime stays
  * within a bounded ratio of the same-size uniform fixture. Without the
  * guards the skewed fixtures are structural cliffs, not slowdowns: a
  * stop-shingle in half the docs k²-explodes candidate generation
  * (1200² ≈ 1.4 M pairs from one posting list), so an unbounded ratio
  * here means a guard regressed. Ceilings are deliberately generous
  * (shared CI boxes time noisily — a real cliff overshoots them by an
  * order of magnitude, a noisy run does not). */
class SkewBenchSpec extends SparkSpec {
  import spark.implicits._

  private val NDocs = 2400 // half hot → stop-shingle df 1200 > dfCap 1000
  private val NEvents = 40000

  /** 60 words per doc from a 300-word vocabulary; the skewed variant
    * splices a fixed 5-word stop phrase (= three hot 3-gram shingles,
    * each with df = NDocs/2) into every even doc. */
  private def docFixture(skew: Boolean): String = {
    val stop = Seq("hot", "stop", "phrase", "alpha", "beta")
    val rows = (0 until NDocs).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      val base = Seq.fill(60)("w" + rnd.nextInt(300))
      val words =
        if (skew && i % 2 == 0) base.take(7) ++ stop ++ base.drop(7)
        else base
      val text = words.mkString(" ")
      (i.toLong, text, "en", "src" + (i % 20), text.length.toLong)
    }
    val dir = TempDirs.create(s"graft_skewdocs_$skew")
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Uniform: 2000 users × 20 events. Skewed: user 0 owns HALF the
    * events (one giant session group / one hot shuffle key), the rest
    * spread uniformly. Same total volume and time span. */
  private def eventFixture(skew: Boolean): String = {
    val base = 1700000000000000L // µs epoch
    val rows = (0 until NEvents).map { i =>
      val user =
        if (skew) { if (i % 2 == 0) 0L else 1L + (i / 2) % 2000 }
        else (i % 2000).toLong
      val perUserSeq = if (user == 0L) i / 2 else i / 2000
      (i.toLong, base + i * 37000000L, user,
        Seq("click", "view", "purchase")(i % 3), (i % 97) / 4.0,
        s"""{"k":$perUserSeq}""")
    }
    val dir = TempDirs.create(s"graft_skewevents_$skew")
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartition(8).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** min-of-3 wall time for the registered query on a fixture dir —
    * the min absorbs one-off GC/box-load spikes; a structural cliff
    * inflates every rep, so it still trips the ceiling. */
  private def time(name: String, dir: String): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.min

  test("hot-shingle docs: q61/q62/q121 stay within bounded ratio of uniform") {
    val uni = docFixture(skew = false)
    val hot = docFixture(skew = true)
    for (q <- Seq("q61_ngram_jaccard_pairs", "q62_minhash_lsh_pairs",
        "q121_duplicate_spans")) {
      val tu = time(q, uni)
      val th = time(q, hot)
      info(f"$q uniform $tu%.2fs skewed $th%.2fs ratio ${th / tu}%.2f")
      assert(th <= tu * 6.0 + math.max(2.0, tu * 2.0),
        s"$q skew ratio ${th / tu} — a skew guard has regressed")
    }
  }

  test("hot user with half the events: q42 sessions stay bounded") {
    val uni = eventFixture(skew = false)
    val hot = eventFixture(skew = true)
    val tu = time("q42_session_window", uni)
    val th = time("q42_session_window", hot)
    info(f"q42 uniform $tu%.2fs skewed $th%.2fs ratio ${th / tu}%.2f")
    assert(th <= tu * 6.0 + math.max(2.0, tu * 2.0),
      s"q42 skew ratio ${th / tu} — hot-key aggregation regressed")
  }
}
