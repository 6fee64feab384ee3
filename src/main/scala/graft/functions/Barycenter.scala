package graft.functions

/** Simplified barycentric time correction (p_io.py:55-56; SURVEY.md §2.8
  * "external-library hard part").
  *
  * The reference calls saphires' `brvc` (full JPL-ephemeris barycentric
  * correction with proper motion and parallax). This is a first-order
  * light-travel-time model — circular Earth orbit, no planetary
  * perturbations — accurate to a few seconds, which preserves the
  * pipeline's semantics (a per-epoch additive time correction bounded by
  * ±499 s) without an ephemeris dependency. A production deployment swaps
  * in an ephemeris-backed implementation behind the same signature.
  */
object Barycenter {

  private val AuLightSeconds = 499.004784 // 1 au in light-seconds
  private val Obliquity = math.toRadians(23.4392911)
  /** J2000 epoch as Julian date. */
  private val J2000 = 2451545.0

  /** Approximate Sun→Earth unit vector (equatorial frame) at Julian date. */
  private def earthPosition(jd: Double): (Double, Double, Double) = {
    val d = jd - J2000
    // mean longitude + equation of center (two terms), circular radius
    val g = math.toRadians((357.529 + 0.98560028 * d) % 360.0)
    val q = math.toRadians((280.459 + 0.98564736 * d) % 360.0)
    val lam = q + math.toRadians(1.915) * math.sin(g) +
      math.toRadians(0.020) * math.sin(2 * g)
    val r = 1.00014 - 0.01671 * math.cos(g) - 0.00014 * math.cos(2 * g)
    // Earth heliocentric = −(Sun geocentric)
    val x = -r * math.cos(lam)
    val y = -r * math.sin(lam) * math.cos(Obliquity)
    val z = -r * math.sin(lam) * math.sin(Obliquity)
    (x, y, z)
  }

  /** BJD ≈ JD + (r̂_target · r_earth)/c: project the Earth barycentric
    * position onto the target direction (ra/dec in degrees). */
  def bjdCorrectionSeconds(jd: Double, raDeg: Double, decDeg: Double): Double = {
    val ra = math.toRadians(raDeg); val dec = math.toRadians(decDeg)
    val tx = math.cos(dec) * math.cos(ra)
    val ty = math.cos(dec) * math.sin(ra)
    val tz = math.sin(dec)
    val (ex, ey, ez) = earthPosition(jd)
    (tx * ex + ty * ey + tz * ez) * AuLightSeconds
  }

  /** Barycentric Julian date (days). */
  def bjd(jd: Double, raDeg: Double, decDeg: Double): Double =
    jd + bjdCorrectionSeconds(jd, raDeg, decDeg) / 86400.0
}
