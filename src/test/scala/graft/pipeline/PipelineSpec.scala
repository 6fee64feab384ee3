package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GaussianFitSpec extends SparkSpec {

  private def sample(a: Double, x0: Double, y0: Double, sx: Double,
      sy: Double, off: Double, n: Int = 21) = {
    val xs = scala.collection.mutable.ArrayBuffer[Double]()
    val ys = scala.collection.mutable.ArrayBuffer[Double]()
    val zs = scala.collection.mutable.ArrayBuffer[Double]()
    for (y <- 0 until n; x <- 0 until n) {
      val dx = x - x0; val dy = y - y0
      xs += x; ys += y
      zs += a * math.exp(-dx * dx / (2 * sx * sx) - dy * dy / (2 * sy * sy)) + off
    }
    (xs.toArray, ys.toArray, zs.toArray)
  }

  test("recovers planted parameters on a clean Gaussian") {
    val (xs, ys, zs) = sample(a = 500.0, x0 = 10.3, y0 = 9.7, sx = 2.0,
      sy = 2.5, off = 50.0)
    val fit = GaussianFit.fit(xs, ys, zs)
    assert(fit.converged)
    assert(math.abs(fit.x0 - 10.3) < 0.05)
    assert(math.abs(fit.y0 - 9.7) < 0.05)
    assert(math.abs(fit.amplitude - 500.0) / 500.0 < 0.05)
    // FWHM = mean(2.0, 2.5)*2.3548 = 5.298
    assert(math.abs(fit.fwhm - 2.25 * GaussianFit.SigmaToFwhm) < 0.1)
  }

  test("noisy Gaussian still converges near truth") {
    val rnd = new scala.util.Random(3)
    val (xs, ys, zs) = sample(300.0, 8.0, 8.0, 1.8, 1.8, 10.0, 17)
    val noisy = zs.map(_ + rnd.nextGaussian() * 3.0)
    val fit = GaussianFit.fit(xs, ys, noisy)
    assert(fit.converged)
    assert(math.abs(fit.x0 - 8.0) < 0.2 && math.abs(fit.y0 - 8.0) < 0.2)
  }

  test("degenerate input returns the reference's fwhm=0 sentinel") {
    val fit = GaussianFit.fit(Array(1.0, 2.0), Array(1.0, 2.0), Array(0.0, 0.0))
    assert(!fit.converged && fit.fwhm === 0.0)
  }
}

class PhotometrySpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic star field (FIXTURES.md §B images_long): flat background +
    * planted Gaussians, optional integer shift and hot pixel. */
  private def starField(imgId: Long, size: Int, bkg: Double,
      stars: Seq[(Double, Double, Double, Double)], shift: (Int, Int) = (0, 0),
      hot: Option[(Int, Int, Double)] = None): DataFrame = {
    val rnd = new scala.util.Random(imgId)
    val rows = for (y <- 0 until size; x <- 0 until size) yield {
      var v = bkg + rnd.nextGaussian() * 1.0
      stars.foreach { case (sx0, sy0, amp, sig) =>
        val dx = x - (sx0 + shift._1); val dy = y - (sy0 + shift._2)
        v += amp * math.exp(-(dx * dx + dy * dy) / (2 * sig * sig))
      }
      hot.foreach { case (hy, hx, hv) => if (y == hy && x == hx) v += hv }
      (imgId, y.toLong, x.toLong, v)
    }
    rows.toDF("img_id", "y", "x", "v")
  }

  private val planted = Seq((12.0, 14.0, 800.0, 1.8), (40.0, 22.0, 600.0, 1.8),
    (30.0, 45.0, 700.0, 1.8))

  test("background stats recover the flat level despite stars") {
    val px = starField(1L, 64, 100.0, planted)
    val row = Photometry.backgroundStats(px).head()
    assert(math.abs(row.getAs[Double]("bkg_median") - 100.0) < 1.0)
  }

  test("detection finds exactly the planted stars with accurate centroids") {
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val stars = Photometry.detectStars(px, 10.0, 4)
      .select("xcentroid", "ycentroid").as[(Double, Double)].collect()
    assert(stars.length === planted.length)
    planted.foreach { case (sx, sy, _, _) =>
      assert(stars.exists { case (cx, cy) =>
        math.abs(cx - sx) < 0.5 && math.abs(cy - sy) < 0.5 })
    }
  }

  test("peakMax rejects saturated peaks; excludeBorder drops edge detections") {
    // planted interior stars plus a bright source hugging the edge
    val edge = planted :+ (1.0, 30.0, 3000.0, 1.8)
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, edge))
    val all = Photometry.detectStars(px, 10.0, 4)
    assert(all.count() === edge.length)
    val unsat = Photometry.detectStars(px, 10.0, 4,
      peakMax = 1500.0, excludeBorder = 0, width = 64, height = 64)
      .select("peak").as[Double].collect()
    assert(unsat.nonEmpty && unsat.forall(_ < 1500.0))
    val interior = Photometry.detectStars(px, 10.0, 4,
      peakMax = Double.MaxValue, excludeBorder = 4, width = 64, height = 64)
      .select("xcentroid").as[Double].collect()
    assert(interior.length === planted.length) // edge star gone
    assert(interior.forall(_ > 3.0))
  }

  test("detection emits DAOFIND-style shape stats (find_stars catalog columns)") {
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val rows = Photometry.detectStars(px, 10.0, 4)
      .select("sharpness", "roundness", "npix", "sky", "flux", "mag")
      .as[(Double, Double, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sharp, round, npix, sky, flux, mag) =>
      // a Gaussian peak stands above its 8 neighbors but not infinitely
      assert(sharp > 0.0 && sharp < 1.0, s"sharpness $sharp")
      // planted stars are circular: marginal widths nearly equal
      assert(math.abs(round) < 0.2, s"roundness $round")
      assert(npix === 81L) // full (2*4+1)^2 box away from borders
      assert(math.abs(sky) < 2.0) // background already subtracted
      assert(math.abs(mag - (-2.5 * math.log10(flux))) < 1e-9)
    }
  }

  test("align + sigma-clipped median combine removes a hot pixel and aligns shifts") {
    val base = starField(0L, 64, 100.0, planted)
    val shifted = starField(1L, 64, 100.0, planted, shift = (2, -1))
    val withHot = starField(2L, 64, 100.0, planted, hot = Some((5, 5, 5000.0)))
    val combined = Photometry.alignAndCombine(
      base.union(shifted).union(withHot), 64, 64)
    // hot pixel clipped away: combined value near background
    val hotV = combined.filter($"y" === 5 && $"x" === 5).select("v").as[Double].head()
    assert(math.abs(hotV - 100.0) < 5.0)
    // star survives at the reference position
    val peak = combined.filter($"y" === 14 && $"x" === 12).select("v").as[Double].head()
    assert(peak > 400.0)
  }

  test("EPSF stack peaks at the center cell") {
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val stars = Photometry.detectStars(px, 10.0, 4)
    val epsf = Photometry.buildEpsf(px, stars, 5, 2)
      .select("w", "u", "epsf").as[(Long, Long, Double)].collect()
    val center = epsf.find(e => e._1 == 0 && e._2 == 0).get._3
    assert(epsf.forall(_._3 <= center + 1e-9))
  }

  test("iterative EPSF build converges to a centered model") {
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val stars = Photometry.detectStars(px, 10.0, 4)
      // perturb centroids so recentering has work to do
      .withColumn("xcentroid", col("xcentroid") + 0.3)
      .withColumn("ycentroid", col("ycentroid") - 0.2)
    val epsf = Photometry.buildEpsfIterative(px, stars, 5, 2, maxIters = 8)
    val c = epsf.agg(
      (sum(col("u") * col("epsf")) / sum(col("epsf"))).as("cu"),
      (sum(col("w") * col("epsf")) / sum(col("epsf"))).as("cw")).head()
    assert(math.abs(c.getDouble(0)) < 0.1 && math.abs(c.getDouble(1)) < 0.1)
  }

  test("iterative photometry recovers planted fluxes within 15%") {
    val sig = 1.8
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val fwhm = sig * GaussianFit.SigmaToFwhm
    val out = Photometry.iterativePhotometry(spark, px, fwhm, 2, 10.0)
      .select("x_fit", "y_fit", "flux_fit").as[(Double, Double, Double)].collect()
    planted.foreach { case (sx, sy, amp, s) =>
      val trueFlux = amp * 2 * math.Pi * s * s
      val got = out.filter(o => math.abs(o._1 - sx) < 1.5 && math.abs(o._2 - sy) < 1.5)
      assert(got.nonEmpty, s"star at ($sx,$sy) not measured")
      val flux = got.map(_._3).sum // re-detections across iterations are residual top-ups
      assert(math.abs(flux - trueFlux) / trueFlux < 0.15,
        s"flux $flux vs true $trueFlux")
    }
  }

  test("group fit refines fractional positions to sub-0.1px (LevMar parity)") {
    // fractional centers: moment centroids over a truncated box are biased
    // here, so passing requires the Gauss-Newton position refinement
    // (core.py:442-450 fits flux AND position), not just the warm start
    val frac = Seq((12.4, 14.7, 800.0, 1.8), (40.6, 22.3, 600.0, 1.8),
      (30.2, 45.8, 700.0, 1.8))
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, frac))
    val fwhm = 1.8 * GaussianFit.SigmaToFwhm
    val out = Photometry.iterativePhotometry(spark, px, fwhm, 1, 10.0)
      .select("x_fit", "y_fit").as[(Double, Double)].collect()
    frac.foreach { case (sx, sy, _, _) =>
      val got = out.minBy(o =>
        (o._1 - sx) * (o._1 - sx) + (o._2 - sy) * (o._2 - sy))
      val err = math.sqrt(
        (got._1 - sx) * (got._1 - sx) + (got._2 - sy) * (got._2 - sy))
      assert(err < 0.1, s"position error $err at ($sx,$sy), got $got")
    }
  }

  test("residual cutouts: image center bright, residual center near zero") {
    val sig = 1.8
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
      .localCheckpoint()
    val fwhm = sig * GaussianFit.SigmaToFwhm
    val psf = Photometry.GaussianPsf(sig)
    val boxR = math.max(math.ceil(2 * fwhm).toInt, 2)
    val fitted = Photometry.iterativePhotometry(spark, px, fwhm, 1, 10.0)
    val residual = Photometry.subtractModel(px, fitted, psf, boxR)
    val cuts = Photometry.residualCutouts(px, residual, fitted, 2)
      .select("flux", "n_px", "image_cutout", "residual_cutout")
      .as[(Double, Long, Seq[Double], Seq[Double])].collect()
    assert(cuts.length >= planted.length)
    // flux-desc order (core.py:477's sort)
    assert(cuts.map(_._1).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    cuts.take(planted.length).foreach { case (flux, nPx, img, res) =>
      assert(nPx === 25 && img.length === 25 && res.length === 25)
      val center = img(12) // row-major (dy,dx) sorted => center at index 12
      assert(center > 0.5 * img.max, "image cutout should peak near center")
      assert(math.abs(res(12)) < 0.2 * center,
        s"residual center ${res(12)} not subtracted vs image $center")
    }
  }

  test("EPSF-based photometry (build_psf → do_photometry loop) recovers fluxes") {
    val sig = 1.8
    val px = Photometry.subtractBackground(starField(1L, 64, 100.0, planted))
    val fwhm = sig * GaussianFit.SigmaToFwhm
    val out = Photometry.epsfPhotometry(spark, px, fwhm, 2, 10.0)
      .select("x_fit", "y_fit", "flux_fit").as[(Double, Double, Double)].collect()
    planted.foreach { case (sx, sy, amp, s) =>
      val trueFlux = amp * 2 * math.Pi * s * s
      val got = out.filter(o => math.abs(o._1 - sx) < 1.5 && math.abs(o._2 - sy) < 1.5)
      assert(got.nonEmpty, s"star at ($sx,$sy) not measured by EPSF photometry")
      val flux = got.map(_._3).sum
      assert(math.abs(flux - trueFlux) / trueFlux < 0.25,
        s"EPSF flux $flux vs true $trueFlux")
    }
  }

  test("star grouping: connected components within link radius") {
    val stars = Seq(
      (1L, 1, 10.0, 10.0, 1.0, 1.0), (1L, 2, 12.0, 10.0, 1.0, 1.0),
      (1L, 3, 13.5, 10.0, 1.0, 1.0), // chain 1-2-3 transitively linked
      (1L, 4, 50.0, 50.0, 1.0, 1.0))
      .toDF("img_id", "star_id", "xcentroid", "ycentroid", "peak", "flux")
    val groups = Photometry.groupStars(spark, stars, 2.5)
      .select("star_id", "group_id").as[(Int, Int)].collect().toMap
    assert(groups(1) === groups(2) && groups(2) === groups(3))
    assert(groups(4) !== groups(1))
  }
}
