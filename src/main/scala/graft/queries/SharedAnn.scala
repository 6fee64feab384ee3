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

  private val cache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Any]()

  private def memo[T](s: SparkSession, d: String, key: String)(f: => T): T =
    cache.getOrElseUpdate((s, d, key), f).asInstanceOf[T]

  /** The registered probe set every ANN query/cert uses. */
  def probes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 10)

  /** Exact brute-force cosine top-5 per probe — the shared quadratic
    * ground truth (and q70's registered result). Computed once per
    * (session, dir). */
  def exactTop5(s: SparkSession, d: String): DataFrame =
    memo(s, d, "exactTop5") {
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", probes(s, d), "vec_id", "embedding", 5)
        .localCheckpoint()
    }

  /** q71's IVF result (label cells, nprobe=4, spill=2) — certified by
    * q95 against [[exactTop5]]. */
  def ivfResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "ivfResult") {
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", probes(s, d), "vec_id", "embedding", 5, 4, spill = 2)
        .localCheckpoint()
    }

  /** q74's sign-LSH result (48 bits / 12 bands) — certified by q96. */
  def lshResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "lshResult") {
      Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", 5, dims = 64,
        nBits = 48, nBands = 12).localCheckpoint()
    }

  /** The one trained PQ model (nSub=16, nCodes=16, iters=3) behind q136's
    * search AND q137's recall + reconstruction gates (and q145's
    * plain-PQ error reference). */
  def pqModel(s: SparkSession, d: String): Pq.PqModel =
    memo(s, d, "pqModel") {
      Pq.train(Tables.embeddings(s, d), "vec_id", "embedding",
        nSub = 16, nCodes = 16, iters = 3)
    }

  /** q136's refined PQ/ADC search result under [[pqModel]] — certified
    * by q137. */
  def pqSearch(s: SparkSession, d: String): DataFrame =
    memo(s, d, "pqSearch") {
      Pq.searchWithModel(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", 5, pqModel(s, d), refine = 16)
        .localCheckpoint()
    }

  /** The one trained OPQ model (q145's configuration). */
  def opqModel(s: SparkSession, d: String): Pq.OpqModel =
    memo(s, d, "opqModel") {
      Pq.trainOpq(Tables.embeddings(s, d), "vec_id", "embedding",
        nSub = 16, nCodes = 16, iters = 3, opqIters = 6)
    }

  /** q138's in-memory IVF-PQ result (residual, spill=2, refine=8) —
    * certified by q140. */
  def ivfPqResult(s: SparkSession, d: String): DataFrame =
    memo(s, d, "ivfPqResult") {
      Pq.ivfPqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        probes(s, d), "vec_id", "embedding", 5, nCells = 16, nprobe = 6,
        nSub = 16, nCodes = 16, iters = 3, residual = true, refine = 8,
        spill = 2).localCheckpoint()
    }

  /** Full-corpus on-disk IVF index (q112's configuration) — READ-ONLY:
    * probed by q112 and reused as q127's rebuilt arm. */
  def fullIvfIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "fullIvfIndexDir") {
      val dir = TempDirs.create("graft_ivf_index")
      Similarity.writeIvfIndex(Tables.embeddings(s, d), "vec_id",
        "embedding", dir, nCells = 16, iters = 3, spill = 2)
      dir
    }

  /** Full-corpus on-disk IVF-PQ index (q141's configuration) —
    * READ-ONLY: probed by q141 and reused as q142's rebuilt arm. */
  def fullIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "fullIvfPqIndexDir") {
      val dir = TempDirs.create("graft_ivfpq_index")
      Pq.writeIvfPqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nCells = 16, nSub = 16, nCodes = 16, iters = 3, spill = 2)
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
        nCells = 16, nSub = 16, nCodes = 16, iters = 3, spill = 2)
      dir
    }

  /** Full-corpus on-disk OPQ-IVFPQ index (q148's configuration:
    * q141's + the learned rotation as the third model sidecar) —
    * READ-ONLY: probed by q148 and reused as q149's rebuilt arm. */
  def opqFullIvfPqIndexDir(s: SparkSession, d: String): String =
    memo(s, d, "opqFullIvfPqIndexDir") {
      val dir = TempDirs.create("graft_opq_ivfpq_index")
      Pq.writeIvfPqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nCells = 16, nSub = 16, nCodes = 16, iters = 3, spill = 2,
        opqIters = 6)
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
        "vec_id", "embedding", dir, nCells = 16, nSub = 16, nCodes = 16,
        iters = 3, spill = 2, opqIters = 6)
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
        src.listFiles().foreach(f => walk(f, new java.io.File(dest, f.getName)))
      } else {
        java.nio.file.Files.copy(src.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    walk(new java.io.File(srcDir), new java.io.File(dst))
    dst
  }
}
