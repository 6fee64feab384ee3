package graft.queries

import graft.{NamedQuery, Tables}
import graft.pipeline.{GaussianFit, Photometry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-visible pixel-pipeline queries: a deterministic star field is
  * rendered from fixture rows (supplier-seeded positions/amplitudes over a
  * spark.range grid), then the image-domain operators run on it. The
  * detection/photometry chains are not ANSI-SQL-expressible (local-max
  * generator + iterative fit), so these are rows-only checks; numeric
  * correctness is covered by the planted-truth ScalaTests in
  * graft.pipeline.
  */
object PixelQueries {

  private val SIZE = 64

  /** Shared-intermediate cache: the rendered field and its derived stages
    * are common subplans of q80–q83. Materializing each once per
    * (session, sf-dir) — the engine-level analog of a materialized CTE —
    * means the driver's sequential query runs don't re-render; the first
    * query that needs a stage pays for it. localCheckpoint also cuts the
    * downstream plans' analysis cost to a leaf scan. */
  private val memo = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]()
  private def cached(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame = {
    val perSession = memo.synchronized {
      var t = memo.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        memo.put(s, t)
        // weak keying lets a dereferenced session's entries be collected;
        // an explicit stop drops them immediately
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            memo.synchronized { memo.remove(s) }
        })
      }
      t
    }
    perSession.getOrElseUpdate(s"$key|$dir", build.localCheckpoint())
  }

  /** Render: flat background 100 + one Gaussian per selected supplier, on a
    * SIZE² grid. Deterministic in the fixture keys; no RNG. Stars sit on a
    * corners+center lattice whose minimum pairwise distance (31 px) clears
    * the pipeline's 5·fwhm ≈ 21 px crowding radius, so the mask keeps all
    * of them and the end-to-end epoch query exercises the `ok` branch. */
  private def renderField(s: SparkSession, d: String): DataFrame = {
    val k = col("s_suppkey") - 1 // 0..4
    val stars = Tables.supplier(s, d)
      .filter(col("s_suppkey") < 6)
      .select(
        when(k === 4, lit(32.0))
          .otherwise(lit(10.0) + (k % 2) * 44).cast(DoubleType).as("sx"),
        when(k === 4, lit(32.0))
          .otherwise(lit(10.0) + floor(k / 2) * 44).cast(DoubleType).as("sy"),
        (col("s_acctbal") % 2000 + 1200).as("amp"))
    val grid = s.range(SIZE.toLong * SIZE).select(
      (col("id") / SIZE).cast(LongType).as("y"),
      (col("id") % SIZE).as("x"))
    // deterministic pseudo-noise from pure integer arithmetic (Knuth
    // multiplicative hash, exact in any engine — no transcendentals, so a
    // DuckDB oracle reproduces it bit-for-bit): uniform ±3 ADU. Without
    // noise the clipped background σ is degenerate and the 10σ detection
    // threshold admits every Gaussian halo pixel as a candidate.
    val noise = ((col("y") * 64 + col("x") + 1) * lit(2654435761L) % 1024
      - lit(511.5)) / lit(1024.0) * 6.0
    grid.crossJoin(broadcast(stars))
      .withColumn("contrib", col("amp") * exp(
        (negate((col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy")))) / lit(2.0 * 1.8 * 1.8)))
      .groupBy(col("y"), col("x"))
      .agg((sum(col("contrib")) + lit(100.0)).as("v"))
      .select(lit(1L).as("img_id"), col("y"), col("x"),
        (col("v") + noise).as("v"))
  }

  private def field(s: SparkSession, d: String): DataFrame =
    cached(s, d, "field")(renderField(s, d))
  /** Test access to the rendered field (planted-truth pipeline specs). */
  private[graft] def fieldFor(s: SparkSession, d: String): DataFrame = field(s, d)
  private def bgSub(s: SparkSession, d: String): DataFrame =
    cached(s, d, "bgsub")(Photometry.subtractBackground(field(s, d)))
  private def detected(s: SparkSession, d: String): DataFrame =
    cached(s, d, "stars")(Photometry.detectStars(bgSub(s, d), 10.0, 4))

  /** Detection generator on the rendered field (find_stars semantics,
    * core.py:116-146): one output row per detected star. */
  private val q80 = NamedQuery(
    "q80_star_detection",
    (s, d) => detected(s, d),
    None)

  /** Iteratively-subtracted PSF photometry on the rendered field
    * (do_photometry, core.py:416-452). */
  private val q81 = NamedQuery(
    "q81_psf_photometry",
    (s, d) => Photometry.iterativePhotometry(s, bgSub(s, d),
      fwhm = 1.8 * GaussianFit.SigmaToFwhm, nIters = 2, nSigma = 10.0),
    None)

  /** Per-star annulus background on the rendered field (bkg_sub,
    * core.py:352-381). */
  private val q82 = NamedQuery(
    "q82_annulus_background",
    (s, d) => Photometry.annulusBackground(
      field(s, d), detected(s, d), 6.0, 10.0),
    None)

  /** The reference's complete per-epoch pipeline (psf_phot.py:9-98) on the
    * rendered field: combine → background → FWHM → mask → EPSF →
    * photometry → catalog, guards included. */
  private val q83 = NamedQuery(
    "q83_epoch_pipeline",
    (s, d) => graft.pipeline.EpochPipeline
      .run(s, field(s, d), SIZE, SIZE, minStars = 2)
      .catalog,
    None)

  val all: Seq[NamedQuery] = Seq(q80, q81, q82, q83)
}
