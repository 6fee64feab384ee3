package graft.pipeline

/** Damped Gauss-Newton least-squares fit of the reference's 6-parameter 2-D
  * Gaussian (`find_fwhm`, core.py:52-114; model core.py:84-86):
  *
  *   f(x,y) = A·exp(−(x−x0)²/(2σx²) − (y−y0)²/(2σy²)) + off
  *
  * scipy's `curve_fit` (LM) is not available on the JVM, so this is a
  * hand-rolled Levenberg-Marquardt-style solver for this fixed model
  * (SURVEY.md §7 hard-part 2). Pure Scala, allocation-light — it runs
  * inside executors via UDF / flatMapGroups on per-star cutouts, so the
  * driver never sees pixel data.
  *
  * Matches the reference's failure semantics: non-convergence or an
  * implausible width returns FWHM 0 as a sentinel (core.py:94-96 sets
  * `im_sig = 0` → callers guard on it, psf_phot.py:53-55).
  */
object GaussianFit {

  /** σ→FWHM factor (core.py:93, astropy gaussian_sigma_to_fwhm). */
  val SigmaToFwhm: Double = 2.3548200450309493

  final case class Fit(amplitude: Double, x0: Double, y0: Double,
      sigmaX: Double, sigmaY: Double, offset: Double, converged: Boolean) {
    /** FWHM = mean(σx, σy)·2.3548 (core.py:92-93). */
    def fwhm: Double =
      if (!converged) 0.0
      else (math.abs(sigmaX) + math.abs(sigmaY)) / 2.0 * SigmaToFwhm
  }

  /** Fit the model to sampled pixels (xs, ys, zs). Returns converged=false
    * (callers read fwhm=0) when the solve diverges or produces NaNs. */
  def fit(xs: Array[Double], ys: Array[Double], zs: Array[Double],
      maxIters: Int = 100): Fit = {
    require(xs.length == ys.length && ys.length == zs.length)
    val n = zs.length
    if (n < 7) return Fit(0, 0, 0, 0, 0, 0, converged = false)

    // init: offset=min, amplitude=range, centroid at peak, width from extent
    var zMin = Double.MaxValue; var zMax = Double.MinValue; var iMax = 0
    var i = 0
    while (i < n) {
      if (zs(i) < zMin) zMin = zs(i)
      if (zs(i) > zMax) { zMax = zs(i); iMax = i }
      i += 1
    }
    val extent = math.max(xs.max - xs.min, ys.max - ys.min)
    var p = Array(zMax - zMin, xs(iMax), ys(iMax),
      math.max(extent / 8.0, 1.0), math.max(extent / 8.0, 1.0), zMin)
    var lambda = 1e-3
    var prevCost = cost(p, xs, ys, zs)
    var it = 0
    var stalled = 0
    while (it < maxIters && stalled < 5) {
      val (jtj, jtr) = normalEquations(p, xs, ys, zs)
      var accepted = false
      var tries = 0
      while (!accepted && tries < 8) {
        val damped = jtj.map(_.clone())
        var k = 0
        while (k < 6) { damped(k)(k) += lambda * (1.0 + jtj(k)(k)); k += 1 }
        solve6(damped, jtr) match {
          case Some(delta) =>
            val cand = Array.tabulate(6)(j => p(j) - delta(j))
            val c = cost(cand, xs, ys, zs)
            if (c.isNaN) { lambda *= 10; tries += 1 }
            else if (c < prevCost) {
              if (prevCost - c < 1e-12 * (prevCost + 1e-30)) stalled += 1
              else stalled = 0
              p = cand; prevCost = c; lambda = math.max(lambda / 3, 1e-12)
              accepted = true
            } else { lambda *= 10; tries += 1 }
          case None => lambda *= 10; tries += 1
        }
      }
      if (!accepted) stalled = 5
      it += 1
    }
    val ok = !p.exists(v => v.isNaN || v.isInfinite) &&
      math.abs(p(3)) > 1e-6 && math.abs(p(4)) > 1e-6 && p(0) > 0
    Fit(p(0), p(1), p(2), p(3), p(4), p(5), converged = ok)
  }

  private def model(p: Array[Double], x: Double, y: Double): Double = {
    val dx = x - p(1); val dy = y - p(2)
    p(0) * math.exp(-dx * dx / (2 * p(3) * p(3)) - dy * dy / (2 * p(4) * p(4))) + p(5)
  }

  private def cost(p: Array[Double], xs: Array[Double], ys: Array[Double],
      zs: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < zs.length) {
      val r = model(p, xs(i), ys(i)) - zs(i); s += r * r; i += 1
    }
    s
  }

  /** Accumulate JᵀJ and Jᵀr with analytic derivatives. */
  private def normalEquations(p: Array[Double], xs: Array[Double],
      ys: Array[Double], zs: Array[Double]): (Array[Array[Double]], Array[Double]) = {
    val jtj = Array.ofDim[Double](6, 6)
    val jtr = new Array[Double](6)
    val g = new Array[Double](6)
    var i = 0
    while (i < zs.length) {
      val dx = xs(i) - p(1); val dy = ys(i) - p(2)
      val sx2 = p(3) * p(3); val sy2 = p(4) * p(4)
      val e = math.exp(-dx * dx / (2 * sx2) - dy * dy / (2 * sy2))
      val ae = p(0) * e
      g(0) = e
      g(1) = ae * dx / sx2
      g(2) = ae * dy / sy2
      g(3) = ae * dx * dx / (sx2 * p(3))
      g(4) = ae * dy * dy / (sy2 * p(4))
      g(5) = 1.0
      val r = ae + p(5) - zs(i)
      var a = 0
      while (a < 6) {
        jtr(a) += g(a) * r
        var b = 0
        while (b < 6) { jtj(a)(b) += g(a) * g(b); b += 1 }
        a += 1
      }
      i += 1
    }
    (jtj, jtr)
  }

  /** 6×6 Gaussian elimination with partial pivoting; None if singular. */
  private def solve6(m: Array[Array[Double]], rhs: Array[Double]): Option[Array[Double]] = {
    val a = m.map(_.clone()); val b = rhs.clone()
    var col = 0
    while (col < 6) {
      var piv = col; var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < 6) {
        if (math.abs(a(r)(col)) > best) { best = math.abs(a(r)(col)); piv = r }
        r += 1
      }
      if (best < 1e-300) return None
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      r = col + 1
      while (r < 6) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c < 6) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](6)
    var row = 5
    while (row >= 0) {
      var s = b(row)
      var c = row + 1
      while (c < 6) { s -= a(row)(c) * x(c); c += 1 }
      x(row) = s / a(row)(row)
      row -= 1
    }
    Some(x)
  }
}
