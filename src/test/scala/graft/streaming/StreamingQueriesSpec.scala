package graft.streaming

import graft.{SparkEntry, SparkSpec}

/** The driver-visible streaming queries certify incremental ≡ batch via
  * the DuckDB oracle; this spec asserts the same equivalence in-repo so a
  * regression fails fast without the driver loop. */
class StreamingQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("incremental tumbling windows ≡ batch (q93 vs q40)") {
    val inc = SparkEntry.queries("q93_incremental_windows")(spark, sf)
    val batch = SparkEntry.queries("q40_tumbling_window")(spark, sf)
    assert(inc.count() === batch.count())
    assert(inc.exceptAll(batch).isEmpty && batch.exceptAll(inc).isEmpty)
  }

  test("incremental sessions ≡ batch (q94 vs q42)") {
    val inc = SparkEntry.queries("q94_incremental_sessions")(spark, sf)
    val batch = SparkEntry.queries("q42_session_window")(spark, sf)
    assert(inc.count() === batch.count())
    assert(inc.exceptAll(batch).isEmpty && batch.exceptAll(inc).isEmpty)
  }

  test("replay determinism: a second q93 run produces the identical table") {
    // the hash gate depends on re-runs being bit-stable even though each
    // run stages fresh files and a fresh micro-batch sequence
    val a = SparkEntry.queries("q93_incremental_windows")(spark, sf)
    val b = SparkEntry.queries("q93_incremental_windows")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
