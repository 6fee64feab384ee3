package graft.queries

import graft.{Tables, TempDirs}
import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped cache of the ANN family's shared heavy artifacts.
  *
  * The recall-certificate family (q95/q96/q106/q127/q137/q140/q142/q145)
  * and the operator queries it certifies (q71/q74/q112/q136/q138/q141/
  * q143) all reference the SAME deterministic sub-results: the quadratic
  * brute-force ground truth over the fixed probe set, the trained PQ/OPQ
  * models, and the full-corpus on-disk indexes. Before round 9 each
  * query rebuilt its own copy — 8 independent brute-force scans and 4
  * redundant trainings/builds, ~48 % of bench wall-clock. Everything
  * here is a pure function of (data directory, pinned configuration), so
  * one memoized build per session serves every consumer with BYTE-
  * IDENTICAL results (training is hash-seeded, ranking deterministically
  * tie-broken; on-disk build determinism is asserted in PqSpec), and the
  * certificates' gate rows are unchanged by construction.
  *
  * Keys include the SparkSession (identity) so test suites with their
  * own sessions never see another session's cached plans, and the data
  * dir so sf0.01/sf0.1 runs coexist. Cached DataFrames are tiny
  * (|probes|·k rows) and `localCheckpoint`ed so consumers re-read
  * materialized blocks instead of re-executing the lineage.
  *
  * At 100 TB the same shape applies unchanged: ground truth, models and
  * serving indexes are built once and SERVED many times — this object is
  * the session-local form of that catalog discipline, not a benchmark
  * trick.
  */
object SharedAnn {

  /** The ONE pinned ANN configuration behind every memoized artifact
    * below. PlanSpec's operator-plan fences build twin plans from THESE
    * constants (the registered queries return materialized checkpoints,
    * which cannot be plan-fenced), so fence and build cannot drift —
    * change a value here and both move together. */
  object Cfg {
    val K = 5                 // top-k for every ANN result + ground truth
    val NSub = 16             // PQ subspaces
    val NCodes = 16           // codes per subspace
    val Iters = 3             // Lloyd rounds (PQ + coarse quantizer)
    val OpqIters = 6          // OPQ alternations (q145/q148/q149)
    val NCells = 16           // IVF coarse cells
    val Nprobe = 6            // IVF-PQ probe fan-out (q138/q141/q148)
    val IvfNprobe = 4         // plain-IVF probe fan-out (q71)
    val Spill = 2             // multi-cell placement fan-out
    val Refine = 8            // IVF-PQ exact re-rank pool (q138)
    val PqRefine = 16         // flat-PQ exact re-rank pool (q136/q145)
    val LshBits = 48          // sign-LSH hyperplanes (q74)
    val LshBands = 12         // sign-LSH bands (q74)
    val Dims = 64             // embedding dimensionality
    val NProbes = 50          // certificate probe-set size (vec_id < NProbes)
  }

  private val cache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Any]()

  /** Bench provenance (round-15 VERDICT item 8): which consumer paid each
    * memoized build. The bench sets [[payer]] to the query name before
    * each measurement; [[memo]] records the label at ACTUAL build time,
    * so bench_full.json can attribute first-payer cost per query
    * mechanically instead of by adjudication. Empty outside the bench. */
  val payer = new java.util.concurrent.atomic.AtomicReference[String]("")
  private val paidBy =
    scala.collection.concurrent.TrieMap[String, String]()
  def memoPaidBy: Map[String, String] = paidBy.toMap

  // one eviction listener per SparkContext: when the context ends, every
  // cache entry belonging to a session on it is dropped (releasing the
  // checkpointed RDD references) and its on-disk index dirs deleted —
  // without this, a long-lived multi-session service accumulates one
  // orphan artifact set per session
  private val listenerInstalled =
    scala.collection.concurrent.TrieMap[org.apache.spark.SparkContext, Unit]()

  /** Drop every cached artifact built on `sc` and delete its temp index
    * dirs. Called by the context-end listener; public for tests. Takes
    * [[memoLock]] (listener callbacks run on a separate thread) so an
    * in-flight build inside [[memo]] cannot insert its entry AFTER
    * eviction completed and leak one orphan artifact per racing build.
    * Known trade-off: the listener-bus thread can block behind a long
    * in-flight build during shutdown. Accepted — builds are bounded
    * (minutes at worst), correctness beats shutdown latency here, and
    * a finer-grained scheme (per-context stopping flag checked between
    * build stages) buys latency only by reintroducing the leak window
    * it would have to re-close. */
  def evict(sc: org.apache.spark.SparkContext): Unit = memoLock.synchronized {
    cache.keys.filter(_._1.sparkContext eq sc).foreach { k =>
      cache.remove(k).foreach {
        case dir: String => graft.TempDirs.delete(dir)
        case _ => () // checkpointed DataFrames/models die with the context
      }
    }
    listenerInstalled.remove(sc)
    ()
  }

  /** Live entry count for `sc` (test hook for the eviction contract). */
  def cachedEntriesFor(sc: org.apache.spark.SparkContext): Int =
    cache.keys.count(_._1.sparkContext eq sc)

  // getOrElseUpdate on TrieMap is not atomic for the builder: two
  // concurrent first-payers could both run `f` and one temp index build
  // would leak. Bench/Verify drive queries serially, but the memo is
  // synchronized anyway so the catalog is safe under concurrent
  // sessions too (builds are per-(session,dir,key) rare and bounded).
  private val memoLock = new Object
  private def memo[T](s: SparkSession, d: String, key: String)(f: => T): T =
    memoLock.synchronized {
      listenerInstalled.getOrElseUpdate(s.sparkContext, {
        s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = evict(s.sparkContext)
          })
      })
      cache.getOrElseUpdate((s, d, key), {
        val who = Option(payer.get).filter(_.nonEmpty).getOrElse("unattributed")
        paidBy.putIfAbsent(key, who)
        f
      }).asInstanceOf[T]
    }

  /** The registered probe set every ANN query/cert uses. */
  def probes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < Cfg.NProbes)

  /** Exact brute-force cosine top-5 per probe — the shared quadratic
    * ground truth (and q70's registered result). Computed once per
    * (session, dir). */
  def exactTop5(s: SparkSession, d: String): DataFrame =
    memo(s, d, "exactTop5") {
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", probes(s, d), "vec_id", "embedding", Cfg.K)
        .repartition(1).localCheckpoint()
    }

  /** q71's IVF result (label cells, nprobe=4, spill=2) — certified by
    * q95 against [[exactTop5]]. */
  def ivfResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "ivfResult") {
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", probes(s, d), "vec_id", "embedding", Cfg.K,
        Cfg.IvfNprobe, spill = Cfg.Spill).repartition(1).localCheckpoint()
    }

  /** q74's sign-LSH result (48 bits / 12 bands) — certified by q96. */
  def lshResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "lshResult") {
      Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", Cfg.K, dims = Cfg.Dims,
        nBits = Cfg.LshBits, nBands = Cfg.LshBands).repartition(1).localCheckpoint()
    }

  /** The one trained PQ model (nSub=16, nCodes=16, iters=3) behind q136's
    * search AND q137's recall + reconstruction gates (and q145's
    * plain-PQ error reference). */
  def pqModel(s: SparkSession, d: String): Pq.PqModel =
    memo(s, d, "pqModel") {
      Pq.train(Tables.embeddings(s, d), "vec_id", "embedding",
        nSub = Cfg.NSub, nCodes = Cfg.NCodes, iters = Cfg.Iters)
    }

  /** q136's refined PQ/ADC search result under [[pqModel]] — certified
    * by q137. */
  def pqSearch(s: SparkSession, d: String): DataFrame =
    memo(s, d, "pqSearch") {
      Pq.searchWithModel(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", Cfg.K, pqModel(s, d),
        refine = Cfg.PqRefine).repartition(1).localCheckpoint()
    }

  /** The one trained OPQ model (q145's configuration). */
  def opqModel(s: SparkSession, d: String): Pq.OpqModel =
    memo(s, d, "opqModel") {
      Pq.trainOpq(Tables.embeddings(s, d), "vec_id", "embedding",
        nSub = Cfg.NSub, nCodes = Cfg.NCodes, iters = Cfg.Iters,
        opqIters = Cfg.OpqIters)
    }

  /** q138's in-memory IVF-PQ result (residual, spill=2, refine=8) —
    * certified by q140. */
  def ivfPqResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "ivfPqResult") {
      Pq.ivfPqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", Cfg.K, nCells = Cfg.NCells,
        nprobe = Cfg.Nprobe, nSub = Cfg.NSub, nCodes = Cfg.NCodes,
        iters = Cfg.Iters, residual = true, refine = Cfg.Refine,
        spill = Cfg.Spill).repartition(1).localCheckpoint()
    }

  /** Full-corpus on-disk IVF index (q112's configuration) — READ-ONLY:
    * probed by q112 and reused as q127's rebuilt arm. */
  def fullIvfIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "fullIvfIndexDir") {
      val dir = TempDirs.create("graft_ivf_index")
      Similarity.writeIvfIndex(Tables.embeddings(s, d), "vec_id",
        "embedding", dir, nCells = Cfg.NCells, iters = Cfg.Iters,
        spill = Cfg.Spill)
      dir
    }

  /** Full-corpus on-disk IVF-PQ index (q141's configuration) —
    * READ-ONLY: probed by q141 and reused as q142's rebuilt arm. */
  def fullIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "fullIvfPqIndexDir") {
      val dir = TempDirs.create("graft_ivfpq_index")
      Pq.writeIvfPqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nCells = Cfg.NCells, nSub = Cfg.NSub, nCodes = Cfg.NCodes,
        iters = Cfg.Iters, spill = Cfg.Spill)
      dir
    }

  /** q112's registered on-disk IVF probe result (nprobe=6, no refine)
    * — memoized because q127's rebuilt arm is the IDENTICAL probe over
    * the same read-only build: one checkpointed result serves both
    * consumers instead of two full probe scans (round-12 task 1). */
  def fullIvfProbe(s: SparkSession, d: String): DataFrame =
    memo(s, d, "fullIvfProbe") {
      Similarity.probeIvfIndex(s, fullIvfIndexDir(s, d), probes(s, d),
        "vec_id", "embedding", Cfg.K, nprobe = Cfg.Nprobe)
        .repartition(1).localCheckpoint()
    }

  /** q141's registered on-disk IVF-PQ probe result (nprobe=6, refine
    * re-rank against the source table) — memoized because q142's
    * rebuilt arm is the IDENTICAL probe over the same read-only build. */
  def fullIvfPqProbe(s: SparkSession, d: String): DataFrame =
    memo(s, d, "fullIvfPqProbe") {
      Pq.probeIvfPqIndex(s, fullIvfPqIndexDir(s, d), probes(s, d),
        "vec_id", "embedding", Cfg.K, nprobe = Cfg.Nprobe,
        refineWith = Some((Tables.embeddings(s, d), "vec_id", "embedding")))
        .repartition(1).localCheckpoint()
    }

  /** q148's registered on-disk OPQ-IVFPQ probe result — memoized
    * because q149's rebuilt arm is the IDENTICAL probe over the same
    * read-only build. */
  def opqFullIvfPqProbe(s: SparkSession, d: String): DataFrame =
    memo(s, d, "opqFullIvfPqProbe") {
      Pq.probeIvfPqIndex(s, opqFullIvfPqIndexDir(s, d), probes(s, d),
        "vec_id", "embedding", Cfg.K, nprobe = Cfg.Nprobe,
        refineWith = Some((Tables.embeddings(s, d), "vec_id", "embedding")))
        .repartition(1).localCheckpoint()
    }

  /** On-disk plain-IVF index over the 75 % base corpus (q127's
    * starting point — the IVF twin of [[baseIvfPqIndexDir]]) —
    * READ-ONLY: appending consumers must [[copyIndex]] it first. */
  def baseIvfIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "baseIvfIndexDir") {
      val dir = TempDirs.create("graft_ivf_base")
      Similarity.writeIvfIndex(
        Tables.embeddings(s, d).filter(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", dir,
        nCells = Cfg.NCells, iters = Cfg.Iters, spill = Cfg.Spill)
      dir
    }

  /** On-disk IVF-PQ index over the 75 % base corpus
    * (`vec_id % 4 =!= 0`, q142/q143's shared starting point) —
    * READ-ONLY: appending consumers must [[copyIndex]] it first. */
  def baseIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "baseIvfPqIndexDir") {
      val dir = TempDirs.create("graft_ivfpq_base")
      Pq.writeIvfPqIndex(
        Tables.embeddings(s, d).filter(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", dir,
        nCells = Cfg.NCells, nSub = Cfg.NSub, nCodes = Cfg.NCodes,
        iters = Cfg.Iters, spill = Cfg.Spill)
      dir
    }

  /** Full-corpus on-disk OPQ-IVFPQ index (q148's configuration:
    * q141's + the learned rotation as the third model sidecar) —
    * READ-ONLY: probed by q148 and reused as q149's rebuilt arm. */
  def opqFullIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "opqFullIvfPqIndexDir") {
      val dir = TempDirs.create("graft_opq_ivfpq_index")
      Pq.writeIvfPqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nCells = Cfg.NCells, nSub = Cfg.NSub, nCodes = Cfg.NCodes,
        iters = Cfg.Iters, spill = Cfg.Spill, opqIters = Cfg.OpqIters)
      dir
    }

  /** On-disk OPQ-IVFPQ index over the 75 % base corpus (q149's
    * starting point) — READ-ONLY: appending consumers must
    * [[copyIndex]] it first. */
  def opqBaseIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "opqBaseIvfPqIndexDir") {
      val dir = TempDirs.create("graft_opq_ivfpq_base")
      Pq.writeIvfPqIndex(
        Tables.embeddings(s, d).filter(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", dir, nCells = Cfg.NCells,
        nSub = Cfg.NSub, nCodes = Cfg.NCodes, iters = Cfg.Iters,
        spill = Cfg.Spill, opqIters = Cfg.OpqIters)
      dir
    }

  /** Clone an on-disk index into a fresh temp dir (mutating consumers —
    * append certs — start from a file copy so the shared build stays
    * pristine; build determinism is separately proven in PqSpec, so a
    * copy ≡ an identical rebuild). */
  def copyIndex(srcDir: String, prefix: String): String = {
    val dst = TempDirs.create(prefix)
    def walk(src: java.io.File, dest: java.io.File): Unit =
      if (src.isDirectory) {
        dest.mkdirs()
        // listFiles() returns null (not empty) on a vanished or
        // unreadable dir — fail with the path, not an opaque NPE
        val children = src.listFiles()
        require(children != null, s"copyIndex: cannot list $src")
        children.foreach(f => walk(f, new java.io.File(dest, f.getName)))
      } else {
        java.nio.file.Files.copy(src.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    walk(new java.io.File(srcDir), new java.io.File(dst))
    dst
  }
}
