package graft.queries

import graft.SparkSpec

/** Lifecycle contract of the shared ANN artifact catalog: entries are
  * evicted (and their on-disk index dirs deleted) when their
  * SparkContext ends — [[SharedAnn.evict]] IS the context-end
  * listener's body, so exercising it directly covers the listener path
  * without stopping the suite's shared context. */
class SharedAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("eviction drops per-session artifacts and deletes index dirs; " +
      "sequential sessions don't accumulate entries") {
    val sc = spark.sparkContext
    // leave no other spec's artifacts in the account below
    SharedAnn.evict(sc)
    assert(SharedAnn.cachedEntriesFor(sc) === 0)

    // session 1 builds an on-disk artifact + a checkpointed result
    val s1 = spark.newSession()
    val idx1 = SharedAnn.fullIvfIndexDir(s1, dir)
    SharedAnn.exactTop5(s1, dir).count()
    assert(new java.io.File(idx1).exists())
    val after1 = SharedAnn.cachedEntriesFor(sc)
    assert(after1 >= 2)

    // context "ends" → everything evicted, dirs gone
    SharedAnn.evict(sc)
    assert(SharedAnn.cachedEntriesFor(sc) === 0)
    assert(!new java.io.File(idx1).exists())

    // session 2 after eviction rebuilds cleanly and does NOT stack on
    // top of session 1's entries (the multi-session leak the listener
    // prevents in a long-lived service)
    val s2 = spark.newSession()
    val idx2 = SharedAnn.fullIvfIndexDir(s2, dir)
    assert(new java.io.File(idx2).exists())
    assert(SharedAnn.cachedEntriesFor(sc) === 1)

    SharedAnn.evict(sc) // leave global state clean for other suites
    assert(!new java.io.File(idx2).exists())
  }
}
