package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, cos => sparkCos, sin => sparkSin}

/** Barycentric time correction (p_io.py:55-56; SURVEY.md §2.8
  * "external-library hard part").
  *
  * The reference calls saphires' `brvc` (full JPL-ephemeris barycentric
  * correction). This implementation is ephemeris-grade within ~0.5 s
  * using only public series data:
  *
  *   - Earth heliocentric position from a truncated VSOP87D series
  *     (Bretagnon & Francou 1988; the truncation published in Meeus,
  *     "Astronomical Algorithms" 2nd ed. App. III, Earth) — ~85 periodic
  *     terms, good to ~1e-5 rad / 1e-6 au over ±30 yr of J2000;
  *   - precession of the of-date longitude back to the J2000 frame
  *     (5029.0966″/cy), then ecliptic→equatorial rotation at ε₀;
  *   - the Sun's offset from the solar-system barycenter from the four
  *     giant planets (JPL approximate Keplerian elements, Standish;
  *     first-order equation of center) — a ±5 light-second effect the
  *     pure heliocentric model misses.
  *
  * The whole model is closed-form arithmetic (no iteration), written ONCE
  * over an abstract algebra and instantiated three ways so they can never
  * drift apart: plain `Double` math (driver-side use), a codegen-friendly
  * Spark `Column` tree (q51's per-row path — no UDF), and an ANSI SQL
  * string (the DuckDB oracle).
  */
object Barycenter {

  private val AuLightSeconds = 499.004784 // 1 au in light-seconds
  private val J2000 = 2451545.0
  private val EpsJ2000 = math.toRadians(23.4392911) // mean obliquity J2000
  private val Deg = math.Pi / 180.0

  // ---- truncated VSOP87D Earth series ------------------------------------
  // term = (A, B, C) meaning A·cos(B + C·τ), τ = Julian millennia from
  // J2000; A in 1e-8 rad (L, B) or 1e-8 au (R). Dropped tails contribute
  // < ~1e-5 rad / 1e-6 au (< 0.01 light-second projected).
  private type Term = (Double, Double, Double)

  private val L0: Array[Term] = Array(
    (175347046.0, 0.0, 0.0),
    (3341656.0, 4.6692568, 6283.0758500),
    (34894.0, 4.62610, 12566.15170),
    (3497.0, 2.7441, 5753.3849),
    (3418.0, 2.8289, 3.5231),
    (3136.0, 3.6277, 77713.7715),
    (2676.0, 4.4181, 7860.4194),
    (2343.0, 6.1352, 3930.2097),
    (1324.0, 0.7425, 11506.7698),
    (1273.0, 2.0371, 529.6910),
    (1199.0, 1.1096, 1577.3435),
    (990.0, 5.233, 5884.927),
    (902.0, 2.045, 26.298),
    (857.0, 3.508, 398.149),
    (780.0, 1.179, 5223.694),
    (753.0, 2.533, 5507.553),
    (505.0, 4.583, 18849.228),
    (492.0, 4.205, 775.523),
    (357.0, 2.920, 0.067),
    (317.0, 5.849, 11790.629),
    (284.0, 1.899, 796.298),
    (271.0, 0.315, 10977.079),
    (243.0, 0.345, 5486.778),
    (206.0, 4.806, 2544.314),
    (205.0, 1.869, 5573.143),
    (202.0, 2.458, 6069.777),
    (156.0, 0.833, 213.299),
    (132.0, 3.411, 2942.463),
    (126.0, 1.083, 20.775),
    (115.0, 0.645, 0.980),
    (103.0, 0.636, 4694.003),
    (102.0, 0.976, 15720.839),
    (102.0, 4.267, 7.114),
    (99.0, 6.21, 2146.17),
    (98.0, 0.68, 155.42),
    (86.0, 5.98, 161000.69),
    (85.0, 1.30, 6275.96),
    (85.0, 3.67, 71430.70),
    (80.0, 1.81, 17260.15))

  private val L1: Array[Term] = Array(
    (628331966747.0, 0.0, 0.0),
    (206059.0, 2.678235, 6283.075850),
    (4303.0, 2.6351, 12566.1517),
    (425.0, 1.590, 3.523),
    (119.0, 5.796, 26.298),
    (109.0, 2.966, 1577.344),
    (93.0, 2.59, 18849.23),
    (72.0, 1.14, 529.69),
    (68.0, 1.87, 398.15),
    (67.0, 4.41, 5507.55),
    (59.0, 2.89, 5223.69),
    (56.0, 2.17, 155.42),
    (45.0, 0.40, 796.30),
    (36.0, 0.47, 775.52),
    (29.0, 2.65, 7.11),
    (21.0, 5.34, 0.98),
    (19.0, 1.85, 5486.78),
    (19.0, 4.97, 213.30),
    (17.0, 2.99, 6275.96),
    (16.0, 0.03, 2544.31))

  private val L2: Array[Term] = Array(
    (52919.0, 0.0, 0.0),
    (8720.0, 1.0721, 6283.0758),
    (309.0, 0.867, 12566.152),
    (27.0, 0.05, 3.52),
    (16.0, 5.19, 26.30),
    (16.0, 3.68, 155.42),
    (10.0, 0.76, 18849.23),
    (9.0, 2.06, 77713.77),
    (7.0, 0.83, 775.52),
    (5.0, 4.66, 1577.34))

  private val L3: Array[Term] = Array(
    (289.0, 5.844, 6283.076),
    (35.0, 0.0, 0.0),
    (17.0, 5.49, 12566.15),
    (3.0, 5.20, 155.42))

  private val L4: Array[Term] = Array(
    (114.0, 3.142, 0.0),
    (8.0, 4.13, 6283.08))

  private val L5: Array[Term] = Array((1.0, 3.14, 0.0))

  private val B0: Array[Term] = Array(
    (280.0, 3.199, 84334.662),
    (102.0, 5.422, 5507.553),
    (80.0, 3.88, 5223.69),
    (44.0, 3.70, 2352.87),
    (32.0, 4.00, 1577.34))

  private val B1: Array[Term] = Array(
    (9.0, 3.90, 5507.55),
    (6.0, 1.73, 5223.69))

  private val R0: Array[Term] = Array(
    (100013989.0, 0.0, 0.0),
    (1670700.0, 3.0984635, 6283.0758500),
    (13956.0, 3.05525, 12566.15170),
    (3084.0, 5.1985, 77713.7715),
    (1628.0, 1.1739, 5753.3849),
    (1576.0, 2.8469, 7860.4194),
    (925.0, 5.453, 11506.770),
    (542.0, 4.564, 3930.210),
    (472.0, 3.661, 5884.927),
    (346.0, 0.964, 5507.553),
    (329.0, 5.900, 5223.694),
    (307.0, 0.299, 5573.143),
    (243.0, 4.273, 11790.629),
    (212.0, 5.847, 1577.344),
    (186.0, 5.022, 10977.079),
    (175.0, 3.012, 18849.228),
    (110.0, 5.055, 5486.778),
    (98.0, 0.89, 6069.78),
    (86.0, 5.69, 15720.84),
    (86.0, 1.27, 161000.69),
    (65.0, 0.27, 17260.15),
    (63.0, 0.92, 529.69),
    (57.0, 2.01, 83996.85),
    (56.0, 5.24, 71430.70),
    (49.0, 3.25, 2544.31),
    (47.0, 2.58, 775.52),
    (45.0, 5.54, 9437.76),
    (43.0, 6.01, 6275.96),
    (39.0, 5.36, 4694.00),
    (38.0, 2.39, 8827.39),
    (37.0, 0.83, 19651.05),
    (37.0, 4.90, 12139.55),
    (36.0, 1.67, 12036.46),
    (35.0, 1.84, 2942.46),
    (33.0, 0.24, 7084.90),
    (32.0, 0.18, 5088.63),
    (32.0, 1.78, 398.15),
    (28.0, 1.21, 6286.60),
    (28.0, 1.90, 6279.55),
    (26.0, 4.59, 10447.39))

  private val R1: Array[Term] = Array(
    (103019.0, 1.107490, 6283.075850),
    (1721.0, 1.0644, 12566.1517),
    (702.0, 3.142, 0.0),
    (32.0, 1.02, 18849.23),
    (31.0, 2.84, 5507.55),
    (25.0, 1.32, 5223.69),
    (18.0, 1.42, 1577.34),
    (10.0, 5.91, 10977.08),
    (9.0, 1.42, 6275.96),
    (9.0, 0.27, 5486.78))

  private val R2: Array[Term] = Array(
    (4359.0, 5.7846, 6283.0758),
    (124.0, 5.579, 12566.152),
    (12.0, 3.14, 0.0),
    (9.0, 3.63, 77713.77),
    (6.0, 1.87, 5573.14),
    (3.0, 5.47, 18849.23))

  private val R3: Array[Term] = Array(
    (145.0, 4.273, 6283.076),
    (7.0, 3.92, 12566.15))

  private val R4: Array[Term] = Array((4.0, 2.56, 6283.08))

  // ---- giant-planet elements for the Sun–SSB offset ----------------------
  // JPL approximate Keplerian elements (Standish, "Approximate Positions
  // of the Planets", 1800–2050 table), mean ecliptic/equinox of J2000:
  // (a au, e, I°, L₀°, L-rate °/cy, ϖ°, Ω°, m_planet/m_sun).
  private final case class Planet(a: Double, e: Double, incl: Double,
      l0: Double, lRate: Double, peri: Double, node: Double, mu: Double)
  private val Planets = Seq(
    Planet(5.20288700, 0.04838624, 1.30439695, 34.39644051, 3034.74612775,
      14.72847983, 100.47390909, 1.0 / 1047.3486),
    Planet(9.53667594, 0.05386179, 2.48599187, 49.95424423, 1222.49362201,
      92.59887831, 113.66242448, 1.0 / 3497.898),
    Planet(19.18916464, 0.04725744, 0.77263783, 313.23810451, 428.48202785,
      170.95427630, 74.01692503, 1.0 / 22902.98),
    Planet(30.06992276, 0.00859048, 1.77004347, 304.87997031, 218.45945325,
      44.96476227, 131.78422574, 1.0 / 19412.24))
  private val MassNorm = 1.0 / (1.0 + Planets.map(_.mu).sum)

  // ---- one model, three backends -----------------------------------------
  /** Minimal arithmetic the model needs; the three instances make the
    * driver math, the Spark plan, and the DuckDB oracle provably the same
    * expression (differences are engine-libm ULPs, absorbed by r6). */
  private trait Alg[T] {
    def const(d: Double): T
    def add(a: T, b: T): T
    def sub(a: T, b: T): T
    def mul(a: T, b: T): T
    def cos(a: T): T
    def sin(a: T): T
  }

  private object DoubleAlg extends Alg[Double] {
    def const(d: Double) = d
    def add(a: Double, b: Double) = a + b
    def sub(a: Double, b: Double) = a - b
    def mul(a: Double, b: Double) = a * b
    def cos(a: Double) = math.cos(a)
    def sin(a: Double) = math.sin(a)
  }

  private object ColumnAlg extends Alg[Column] {
    def const(d: Double) = lit(d)
    def add(a: Column, b: Column) = a + b
    def sub(a: Column, b: Column) = a - b
    def mul(a: Column, b: Column) = a * b
    def cos(a: Column) = sparkCos(a)
    def sin(a: Column) = sparkSin(a)
  }

  /** SQL text backend. Double.toString is the shortest round-trip decimal,
    * so the oracle parses back the exact same binary64 constants. */
  private object SqlAlg extends Alg[String] {
    def const(d: Double) = {
      val s = d.toString
      if (d < 0) s"($s)" else s
    }
    def add(a: String, b: String) = s"($a + $b)"
    def sub(a: String, b: String) = s"($a - $b)"
    def mul(a: String, b: String) = s"($a * $b)"
    def cos(a: String) = s"COS($a)"
    def sin(a: String) = s"SIN($a)"
  }

  /** The correction in light-seconds: t̂ · r_earth(barycentric, equatorial
    * J2000) · 499.004784, where r_earth = VSOP87 heliocentric Earth minus
    * the mass-weighted giant-planet sum (= Sun→SSB offset, negated). */
  private def model[T](jd: T, raDeg: Double, decDeg: Double)
      (implicit A: Alg[T]): T = {
    import A._
    def k(d: Double): T = const(d)
    // τ (millennia) and T (centuries) since J2000
    val dDays = sub(jd, k(J2000))
    val tau = mul(dDays, k(1.0 / 365250.0))
    val tCen = mul(dDays, k(1.0 / 36525.0))

    def series(terms: Array[Term]): T =
      terms.iterator.map { case (a, b, c) =>
        if (c == 0.0) k(a * 1e-8 * math.cos(b)) // constant term: fold now
        else mul(k(a * 1e-8), cos(add(k(b), mul(k(c), tau))))
      }.reduce(add)
    // Horner in τ
    def horner(ss: Array[Array[Term]]): T =
      ss.toSeq.map(series).reduceRight((s, acc) => add(s, mul(tau, acc)))

    val lDate = horner(Array(L0, L1, L2, L3, L4, L5))
    val bEcl = horner(Array(B0, B1))
    val r = horner(Array(R0, R1, R2, R3, R4))
    // precess the of-date longitude to J2000 (p_A = 5029.0966″/cy + …)
    val precess = mul(mul(tCen,
      add(k(5029.0966), mul(tCen, k(1.11113)))), k(Deg / 3600.0))
    val lon = sub(lDate, precess)

    // heliocentric Earth, ecliptic J2000 cartesian
    val cosB = cos(bEcl)
    val hx = mul(r, mul(cosB, cos(lon)))
    val hy = mul(r, mul(cosB, sin(lon)))
    val hz = mul(r, sin(bEcl))

    // minus the Sun→SSB offset: r_bary = r_helio − Σ μ·r_planet / (1+Σμ)
    val (px, py, pz) = Planets.map { p =>
      val m = add(k((p.l0 - p.peri) * Deg), mul(tCen, k(p.lRate * Deg)))
      // first-order equation of center; e² terms are < 0.01 light-seconds
      // after the mass ratio
      val nu = add(m, mul(k(2.0 * p.e), sin(m)))
      val rp = mul(k(p.a), sub(k(1.0), mul(k(p.e), cos(m))))
      val u = add(nu, k((p.peri - p.node) * Deg)) // argument of latitude
      val cu = cos(u); val su = sin(u)
      val cO = math.cos(p.node * Deg); val sO = math.sin(p.node * Deg)
      val cI = math.cos(p.incl * Deg); val sI = math.sin(p.incl * Deg)
      val w = p.mu * MassNorm
      (mul(rp, sub(mul(k(w * cO), cu), mul(k(w * sO * cI), su))),
        mul(rp, add(mul(k(w * sO), cu), mul(k(w * cO * cI), su))),
        mul(rp, mul(k(w * sI), su)))
    }.reduce((a, b) => (add(a._1, b._1), add(a._2, b._2), add(a._3, b._3)))

    val ex = sub(hx, px)
    val ey = sub(hy, py)
    val ez = sub(hz, pz)

    // ecliptic J2000 → equatorial J2000, then project on the target
    val tx = math.cos(decDeg * Deg) * math.cos(raDeg * Deg)
    val ty = math.cos(decDeg * Deg) * math.sin(raDeg * Deg)
    val tz = math.sin(decDeg * Deg)
    val ce = math.cos(EpsJ2000); val se = math.sin(EpsJ2000)
    // X = ex; Y = ey·cosε − ez·sinε; Z = ey·sinε + ez·cosε — fold the
    // rotation into the (constant) target vector: t′ = Rᵀ t
    val tpx = tx
    val tpy = ty * ce + tz * se
    val tpz = -ty * se + tz * ce
    add(add(mul(k(tpx * AuLightSeconds), ex),
      mul(k(tpy * AuLightSeconds), ey)),
      mul(k(tpz * AuLightSeconds), ez))
  }

  /** BJD − JD in seconds for a target at (ra, dec) degrees (ICRS/J2000). */
  def bjdCorrectionSeconds(jd: Double, raDeg: Double, decDeg: Double): Double =
    model(jd, raDeg, decDeg)(DoubleAlg)

  /** The same correction as a codegen'd Column tree over a JD column —
    * q51's per-row path; no UDF, identical arithmetic to the Double form
    * (both evaluate through java.lang.Math). */
  def bjdCorrectionSecondsColumn(jd: Column, raDeg: Double, decDeg: Double): Column =
    model(jd, raDeg, decDeg)(ColumnAlg)

  /** The same correction as ANSI SQL over `jdExpr` — the DuckDB oracle. */
  def bjdCorrectionSecondsSql(jdExpr: String, raDeg: Double, decDeg: Double): String =
    model(jdExpr, raDeg, decDeg)(SqlAlg)

  /** Barycentric Julian date (days). */
  def bjd(jd: Double, raDeg: Double, decDeg: Double): Double =
    jd + bjdCorrectionSeconds(jd, raDeg, decDeg) / 86400.0

  // ---- exposed for tests --------------------------------------------------
  /** Earth heliocentric (L of-date rad, B rad, R au) — anchor-test hook. */
  private[graft] def earthLBR(jd: Double): (Double, Double, Double) = {
    val tau = (jd - J2000) / 365250.0
    def s(terms: Array[Term]) =
      terms.foldLeft(0.0) { case (acc, (a, b, c)) =>
        acc + a * 1e-8 * math.cos(b + c * tau) }
    val l = Array(L0, L1, L2, L3, L4, L5).map(s)
      .reduceRight((x, acc) => x + tau * acc)
    val b = Array(B0, B1).map(s).reduceRight((x, acc) => x + tau * acc)
    val r = Array(R0, R1, R2, R3, R4).map(s)
      .reduceRight((x, acc) => x + tau * acc)
    (l, b, r)
  }
}
