package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WCS enrichment — the external-astrometry-service boundary
  * (core.py:505-527; SURVEY.md §7 hard-part 4).
  *
  * The reference submits the 30 brightest stars to astrometry.net with a
  * 600 s timeout and an async resume protocol (core.py:514-518). Here the
  * solver is a pluggable function invoked per image inside
  * `flatMapGroups` — executor-side, bounded retries with backoff, never on
  * the driver — and the resulting per-image affine solution joins back onto
  * the full catalog as a broadcast to compute sky coordinates. Tests plug
  * in a deterministic local least-squares solve from matched reference
  * stars (the API key in the reference is a placeholder, core.py:506 — no
  * external calls, ever, in tests).
  */
object WcsEnrichment {

  /** A solver takes the (x, y, flux) of an image's brightest stars and
    * returns affine coefficients [ra0, cd11, cd12, dec0, cd21, cd22]
    * mapping pixel→sky, or None on failure (timeout/no-solution). */
  type Solver = Seq[(Double, Double, Double)] => Option[Array[Double]]

  /** Fit an affine solution per image from its top-k brightest stars and
    * attach (ra, dec) to every catalog row. Images whose solve fails after
    * `maxRetries` keep null sky coordinates — the reference's
    * outputs-without-coordinates guard branch (psf_phot.py:95-98). */
  def enrich(spark: SparkSession, stars: DataFrame, solver: Solver,
      topK: Int = 30, maxRetries: Int = 3): DataFrame = {
    import spark.implicits._
    val ranked = stars
      .select(col("img_id"), col("star_id"), col("xcentroid"),
        col("ycentroid"), col("flux"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("img_id"))
          .orderBy(col("flux").desc, col("star_id"))))
    val solutions = ranked.filter(col("rk") <= topK)
      .select(col("img_id"), col("xcentroid"), col("ycentroid"), col("flux"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (img: Long, it: Iterator[(Long, Double, Double, Double)]) =>
        val pts = it.map(r => (r._2, r._3, r._4)).toSeq
        var attempt = 0
        var res: Option[Array[Double]] = None
        while (res.isEmpty && attempt < maxRetries) {
          res = try solver(pts) catch { case _: Exception => None }
          attempt += 1
          if (res.isEmpty && attempt < maxRetries)
            Thread.sleep(math.min(50L << attempt, 1000L)) // bounded backoff
        }
        res.map(c => (img, c(0), c(1), c(2), c(3), c(4), c(5))).iterator
      }
      .toDF("img_id", "ra0", "cd11", "cd12", "dec0", "cd21", "cd22")
    stars.join(broadcast(solutions), Seq("img_id"), "left_outer")
      .withColumn("ra",
        col("ra0") + col("cd11") * col("xcentroid") + col("cd12") * col("ycentroid"))
      .withColumn("dec",
        col("dec0") + col("cd21") * col("xcentroid") + col("cd22") * col("ycentroid"))
      .drop("ra0", "cd11", "cd12", "dec0", "cd21", "cd22")
  }

  /** The async service protocol (core.py:511-522): a solve is SUBMITTED
    * and returns a submission id; the client POLLS until solved, failed,
    * or its time budget lapses — and a later run RESUMES polling the same
    * submission id instead of re-submitting (the reference stores the id
    * and re-enters wait-on-timeout). */
  sealed trait SolveStatus extends Serializable
  final case class SolvePending() extends SolveStatus
  final case class SolveDone(coeffs: Array[Double]) extends SolveStatus
  final case class SolveFailed() extends SolveStatus

  trait AsyncSolver extends Serializable {
    /** Submit an image's brightest stars; returns a submission id. */
    def submit(pts: Seq[(Double, Double, Double)]): Long
    def poll(subId: Long): SolveStatus
  }

  final case class AsyncResult(enriched: DataFrame, pending: Map[Long, Long])

  /** enrich() over the async protocol with bounded polling and resume:
    * images in `resumeIds` poll their existing submission instead of
    * re-submitting. Returns the catalog (null sky for unsolved images —
    * the psf_phot.py:95-98 guard) plus the still-pending submission ids to
    * carry into the next run. Polling happens executor-side per image
    * group; the pending map is solution-sized (model object), never data. */
  def enrichAsync(spark: SparkSession, stars: DataFrame, solver: AsyncSolver,
      topK: Int = 30, pollBudget: Int = 10,
      resumeIds: Map[Long, Long] = Map.empty): AsyncResult = {
    import spark.implicits._
    val ranked = stars
      .select(col("img_id"), col("xcentroid"), col("ycentroid"), col("flux"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("img_id"))
          .orderBy(col("flux").desc, col("xcentroid"), col("ycentroid"))))
      .filter(col("rk") <= topK)
    val states = ranked
      .select(col("img_id"), col("xcentroid"), col("ycentroid"), col("flux"))
      .as[(Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (img: Long, it: Iterator[(Long, Double, Double, Double)]) =>
        val pts = it.map(r => (r._2, r._3, r._4)).toSeq
        val subId = resumeIds.getOrElse(img, solver.submit(pts))
        var polls = 0
        var state: SolveStatus = SolvePending()
        while (state.isInstanceOf[SolvePending] && polls < pollBudget) {
          state = try solver.poll(subId) catch { case _: Exception => SolvePending() }
          polls += 1
        }
        val (status, c) = state match {
          case SolveDone(coeffs) => ("done", coeffs)
          case SolveFailed() => ("failed", Array.fill(6)(0.0))
          case _ => ("pending", Array.fill(6)(0.0))
        }
        Iterator.single((img, subId, status, c(0), c(1), c(2), c(3), c(4), c(5)))
      }
      .toDF("img_id", "sub_id", "status", "ra0", "cd11", "cd12",
        "dec0", "cd21", "cd22")
      .localCheckpoint() // poll once, not once per downstream action
    val solutions = states.filter(col("status") === "done")
      .drop("sub_id", "status")
    val pending = states.filter(col("status") === "pending")
      .select(col("img_id"), col("sub_id")).as[(Long, Long)]
      .collect().toMap
    val enriched = stars.join(broadcast(solutions), Seq("img_id"), "left_outer")
      .withColumn("ra",
        col("ra0") + col("cd11") * col("xcentroid") + col("cd12") * col("ycentroid"))
      .withColumn("dec",
        col("dec0") + col("cd21") * col("xcentroid") + col("cd22") * col("ycentroid"))
      .drop("ra0", "cd11", "cd12", "dec0", "cd21", "cd22")
    AsyncResult(enriched, pending)
  }

  /** Local least-squares affine solve from (pixel, sky) reference matches —
    * the test/mock replacement for the remote service: fits
    * sky = a0 + a1·x + a2·y by ordinary LSQ per axis. */
  def affineFromMatches(matches: Seq[((Double, Double), (Double, Double))]): Option[Array[Double]] = {
    if (matches.size < 3) return None
    val ata = Array.ofDim[Double](3, 3)
    val atRa = new Array[Double](3)
    val atDec = new Array[Double](3)
    matches.foreach { case ((x, y), (ra, dec)) =>
      val row = Array(1.0, x, y)
      for (i <- 0 until 3) {
        atRa(i) += row(i) * ra
        atDec(i) += row(i) * dec
        for (j <- 0 until 3) ata(i)(j) += row(i) * row(j)
      }
    }
    for {
      raC <- LinAlg.solve(ata, atRa)
      decC <- LinAlg.solve(ata.map(_.clone()), atDec)
    } yield Array(raC(0), raC(1), raC(2), decC(0), decC(1), decC(2))
  }
}
