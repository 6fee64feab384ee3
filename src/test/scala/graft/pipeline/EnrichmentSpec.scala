package graft.pipeline

import graft.SparkSpec
import graft.functions.Barycenter
import org.apache.spark.sql.functions._

/** Serializable state for the executor-side solver closure. */
object WcsTestState extends Serializable {
  val truth: Array[Double] = Array(150.0, 1e-4, 2e-6, -30.0, -3e-6, 1.1e-4)
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  def skyOf(x: Double, y: Double): (Double, Double) =
    (truth(0) + truth(1) * x + truth(2) * y, truth(3) + truth(4) * x + truth(5) * y)
}

class WcsEnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def skyOf(x: Double, y: Double) = WcsTestState.skyOf(x, y)

  test("affine solve recovers a planted solution from matches") {
    val rnd = new scala.util.Random(5)
    val matches = (1 to 20).map { _ =>
      val (x, y) = (rnd.nextDouble() * 1000, rnd.nextDouble() * 1000)
      ((x, y), skyOf(x, y))
    }
    val c = WcsEnrichment.affineFromMatches(matches).get
    WcsTestState.truth.indices.foreach(i =>
      assert(math.abs(c(i) - WcsTestState.truth(i)) < 1e-9))
  }

  test("enrich attaches sky coords via per-image solver with retries; failures keep nulls") {
    val stars = (1 to 40).map { i =>
      val img = if (i <= 20) 1L else 2L
      (img, i, (i * 13 % 100).toDouble, (i * 29 % 100).toDouble, 1000.0 - i)
    }.toDF("img_id", "star_id", "xcentroid", "ycentroid", "flux")
    // solver: solves img 1 from its own star grid (on 2nd attempt to
    // exercise retry), always fails for img 2
    val solver: WcsEnrichment.Solver = pts => {
      if (pts.size >= 15) { // both images submit 20 stars
        val isImg1 = pts.exists { case (_, _, f) => f > 990 }
        if (!isImg1) None
        else if (WcsTestState.attempts.incrementAndGet() < 2) None // force one retry
        else WcsEnrichment.affineFromMatches(
          pts.map { case (x, y, _) => ((x, y), WcsTestState.skyOf(x, y)) })
      } else None
    }
    val out = WcsEnrichment.enrich(spark, stars, solver, topK = 30, maxRetries = 3)
    val img1 = out.filter($"img_id" === 1L && $"star_id" === 1)
      .select("ra", "dec").as[(Double, Double)].head()
    val expect = skyOf(13.0, 29.0)
    assert(math.abs(img1._1 - expect._1) < 1e-6)
    assert(math.abs(img1._2 - expect._2) < 1e-6)
    val img2Nulls = out.filter($"img_id" === 2L && $"ra".isNull).count()
    assert(img2Nulls === 20L)
  }

  test("async protocol: timeout leaves a pending submission; resume polls, not resubmits") {
    val stars = (1 to 20).map { i =>
      (1L, i, (i * 13 % 100).toDouble, (i * 29 % 100).toDouble, 1000.0 - i)
    }.toDF("img_id", "star_id", "xcentroid", "ycentroid", "flux")
    val solver = new WcsEnrichment.AsyncSolver {
      def submit(pts: Seq[(Double, Double, Double)]): Long = {
        AsyncWcsTestState.submits.incrementAndGet()
        AsyncWcsTestState.pts.set(pts.toIndexedSeq)
        77L
      }
      def poll(subId: Long): WcsEnrichment.SolveStatus = {
        require(subId == 77L, "resume must reuse the submission id")
        // stays pending for the first 3 polls (the 600 s timeout window)
        if (AsyncWcsTestState.polls.incrementAndGet() <= 3)
          WcsEnrichment.SolvePending()
        else WcsEnrichment.SolveDone(WcsEnrichment.affineFromMatches(
          AsyncWcsTestState.pts.get.map { case (x, y, _) =>
            ((x, y), WcsTestState.skyOf(x, y)) }).get)
      }
    }
    // run 1: poll budget lapses → no sky coords, submission id surfaced
    val r1 = WcsEnrichment.enrichAsync(spark, stars, solver, pollBudget = 2)
    assert(r1.pending === Map(1L -> 77L))
    assert(r1.enriched.filter($"ra".isNotNull).count() === 0)
    // run 2: resume with the stored id → solved without a second submit
    val r2 = WcsEnrichment.enrichAsync(spark, stars, solver,
      pollBudget = 5, resumeIds = r1.pending)
    assert(r2.pending.isEmpty)
    assert(AsyncWcsTestState.submits.get() === 1, "resume re-submitted")
    val row = r2.enriched.filter($"star_id" === 1)
      .select("ra", "dec").as[(Double, Double)].head()
    val expect = WcsTestState.skyOf(13.0, 29.0)
    assert(math.abs(row._1 - expect._1) < 1e-6)
    assert(math.abs(row._2 - expect._2) < 1e-6)
  }
}

/** Shared state for the async-solver mock (single JVM in local mode). */
object AsyncWcsTestState extends Serializable {
  val submits = new java.util.concurrent.atomic.AtomicInteger(0)
  val polls = new java.util.concurrent.atomic.AtomicInteger(0)
  val pts = new java.util.concurrent.atomic.AtomicReference[IndexedSeq[(Double, Double, Double)]]()
}

class BarycenterSpec extends SparkSpec {

  test("correction bounded by one light-au and roughly annual-periodic") {
    val jd0 = 2460310.5 // 2024-01-01
    val cfg = ObjConfig.canonical
    val corrections = (0 until 365 by 5).map(d =>
      Barycenter.bjdCorrectionSeconds(jd0 + d, cfg.ra, cfg.dec))
    // bound: aphelion 1.0167 au + ~0.008 au Sun–SSB offset → ≤ ~512 ls
    assert(corrections.forall(c => math.abs(c) <= 512.0))
    // ecliptic-plane target: correction must swing both signs over a year
    assert(corrections.max > 100 && corrections.min < -100)
    // ~annual periodicity
    val wrap = Barycenter.bjdCorrectionSeconds(jd0 + 365.25, cfg.ra, cfg.dec)
    assert(math.abs(wrap - corrections.head) < 10.0)
  }

  test("VSOP87 anchors: Meeus 25.b, perihelion and aphelion distances") {
    // Meeus, Astronomical Algorithms, example 25.b (1992 Oct 13.0 TD =
    // JDE 2448908.5): Sun geometric longitude (mean equinox of date)
    // 199°54'26.18" = 199.9072722°, R = 0.99760775 au, β ≈ -0.6"
    val (l, b, r) = Barycenter.earthLBR(2448908.5)
    val lonSun = ((math.toDegrees(l) + 180.0) % 360.0 + 360.0) % 360.0
    assert(math.abs(lonSun - 199.9072722) * 3600 < 5.0,
      s"longitude off: $lonSun") // truncation budget ~1"
    assert(math.abs(r - 0.99760775) < 3e-6, s"radius off: $r")
    assert(math.abs(math.toDegrees(b) * 3600 + 0.62) < 0.5)
    // 2024 perihelion (Jan 3, 0.98330 au) and aphelion (Jul 5, 1.01673 au)
    val jan = (0 until 10 * 24).map(h =>
      Barycenter.earthLBR(2460310.5 + h / 24.0)._3)
    assert(math.abs(jan.min - 0.98330) < 2e-4, s"perihelion ${jan.min}")
    val jul = (0 until 10 * 24).map(h =>
      Barycenter.earthLBR(2460490.5 + h / 24.0)._3)
    assert(math.abs(jul.max - 1.01673) < 2e-4, s"aphelion ${jul.max}")
  }

  test("2024 equinox: geometric solar longitude = aberration offset") {
    // March equinox 2024-03-20 03:06 UTC: APPARENT λ☉ = 0 by definition;
    // GEOMETRIC λ☉ (what the series gives) must sit ~ +20.5" (annual
    // aberration) ± nutation (±17")
    val (l, _, _) = Barycenter.earthLBR(2460389.62941)
    val lam = ((math.toDegrees(l) + 180.0 + 180.0) % 360.0) - 180.0 // (-180,180]
    assert(math.abs(lam * 3600 - 20.5) < 40.0, s"equinox lon ${lam * 3600}\"")
  }

  test("Column tree evaluates bit-identically to the Double model") {
    import spark.implicits._
    val cfg = ObjConfig.canonical
    val jds = Seq(2448908.5, 2460310.5, 2460389.62941, 2465432.1)
    val got = jds.toDF("jd")
      .select(Barycenter.bjdCorrectionSecondsColumn(col("jd"), cfg.ra, cfg.dec))
      .as[Double].collect().toSeq
    val want = jds.map(Barycenter.bjdCorrectionSeconds(_, cfg.ra, cfg.dec))
    assert(got === want) // both run through java.lang.Math — exact
  }

  test("SQL form is well-formed and from the same tables") {
    val sql = Barycenter.bjdCorrectionSecondsSql("jd", 150.125, -32.5)
    assert(sql.count(_ == '(') === sql.count(_ == ')'))
    assert(sql.contains("COS((4.6692568 + (6283.07585 * ")) // main VSOP term
    assert(!sql.toLowerCase.contains("nan") && !sql.contains("Infinity"))
  }

  test("bjd shifts jd by the correction in days") {
    val jd = 2460310.5
    val c = Barycenter.bjdCorrectionSeconds(jd, 73.6, 17.2)
    assert(math.abs(Barycenter.bjd(jd, 73.6, 17.2) - (jd + c / 86400.0)) < 1e-12)
  }
}

class AnnulusSpec extends SparkSpec {
  import spark.implicits._

  test("annulus median ignores the star core, recovers local background") {
    val rows = for (y <- 0 until 41; x <- 0 until 41) yield {
      val d2 = (x - 20) * (x - 20) + (y - 20) * (y - 20)
      val star = 500.0 * math.exp(-d2 / (2.0 * 4.0))
      (1L, y.toLong, x.toLong, 100.0 + star)
    }
    val pixels = rows.toDF("img_id", "y", "x", "v")
    val stars = Seq((1L, 1, 20.0, 20.0)).toDF("img_id", "star_id", "xcentroid", "ycentroid")
    val out = Photometry.annulusBackground(pixels, stars, 10.0, 18.0).head()
    assert(math.abs(out.getAs[Double]("annulus_bkg") - 100.0) < 0.5)
    assert(out.getAs[Long]("n_annulus") > 300)
  }
}
