package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Barycenter, SigmaClippedStats}
import graft.pipeline.LinAlg

/** Property-based invariants (SURVEY.md §5): sigma-clip containment and
  * degenerate-sigma behavior, solver round-trips, phase-fold range,
  * barycentric bound, FITS header round-trips, NN-join ≡ brute force, and
  * set-operation algebra. Pure properties run hundreds of cases; the
  * Spark-backed ones sample fewer (each case is a job). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, samples: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(samples)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val clip = new SigmaClippedStats(2.0, 5)
  private def stats(vs: Seq[Double]) =
    clip.finish(scala.collection.mutable.ArrayBuffer(vs: _*))

  test("sigma-clip: survivor stats stay inside the input envelope") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    check("clip-envelope", 200)(Prop.forAll(gen) { vs =>
      val s = stats(vs)
      val (lo, hi) = (vs.min, vs.max)
      s.n >= 1 && s.n <= vs.length &&
        s.mean >= lo && s.mean <= hi &&
        s.median >= lo && s.median <= hi &&
        s.std >= 0.0 && s.std <= (hi - lo)
    })
  }

  test("sigma-clip: huge sigma clips nothing (plain stats)") {
    val loose = new SigmaClippedStats(1e12, 5)
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))
    check("clip-loose", 200)(Prop.forAll(gen) { vs =>
      val s = loose.finish(scala.collection.mutable.ArrayBuffer(vs: _*))
      s.n == vs.length &&
        math.abs(s.mean - vs.sum / vs.length) < 1e-6
    })
  }

  test("LinAlg.solve round-trips on diagonally dominant systems") {
    val gen = for {
      n <- Gen.choose(1, 6)
      a <- Gen.listOfN(n * n, Gen.chooseNum(-1.0, 1.0))
      x <- Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0))
    } yield (n, a, x)
    check("linalg", 200)(Prop.forAll(gen) { case (n, aFlat, xs) =>
      val a = Array.tabulate(n, n)((i, j) =>
        aFlat(i * n + j) + (if (i == j) n + 1.0 else 0.0)) // dominant diagonal
      val x = xs.toArray
      val b = Array.tabulate(n)(i => (0 until n).map(j => a(i)(j) * x(j)).sum)
      LinAlg.solve(a, b) match {
        case Some(got) => got.zip(x).forall { case (g, e) => math.abs(g - e) < 1e-8 }
        case None => false
      }
    })
  }

  test("phase fold lands in [0, 1) for any time, epoch, and period") {
    val gen = for {
      t <- Gen.chooseNum(-1e9, 1e9)
      t0 <- Gen.chooseNum(-1e6, 1e6)
      p <- Gen.chooseNum(1e-3, 1e4)
    } yield (t, t0, p)
    check("fold", 500)(Prop.forAll(gen) { case (t, t0, p) =>
      // pmod semantics (q43): ((x % p) + p) % p, then normalize
      val phase = (((t - t0) % p) + p) % p / p
      phase >= 0.0 && phase < 1.0
    })
  }

  test("barycentric correction never exceeds aphelion light-time") {
    val gen = for {
      jd <- Gen.chooseNum(2450000.0, 2470000.0)
      ra <- Gen.chooseNum(0.0, 360.0)
      dec <- Gen.chooseNum(-90.0, 90.0)
    } yield (jd, ra, dec)
    check("bary", 300)(Prop.forAll(gen) { case (jd, ra, dec) =>
      // aphelion 1.0167 au + ~0.008 au Sun–SSB offset ≈ 512 light-seconds
      math.abs(Barycenter.bjdCorrectionSeconds(jd, ra, dec)) <= 512.0
    })
  }

  test("barycentric VSOP87 model agrees with an independent Kepler model < 1 s") {
    // Fully independent formulation: Earth from Keplerian elements with
    // the equation of center to e³ + precession to J2000; giant planets
    // as CIRCULAR coplanar orbits (period + epoch longitude only). Shares
    // no series coefficients with the VSOP87 path; residual = neglected
    // perturbations (~0.1 s) + planet eccentricities (~0.3 s).
    def kepler(jd: Double, raDeg: Double, decDeg: Double): Double = {
      val d = jd - 2451545.0
      val tc = d / 36525.0
      val g = math.toRadians((357.529 + 0.98560028 * d) % 360.0)
      val q = math.toRadians((280.459 + 0.98564736 * d) % 360.0)
      val e = 0.016709
      val c = (2 * e - e * e * e / 4) * math.sin(g) +
        1.25 * e * e * math.sin(2 * g) + (13.0 / 12) * e * e * e * math.sin(3 * g)
      val lamDate = q + c // true longitude of the Sun, equinox of date
      val lam = lamDate - math.toRadians(5029.0966 * tc / 3600.0) // → J2000
      val nu = g + c
      val r = 1.000001018 * (1 - e * e) / (1 + e * math.cos(nu))
      // Earth heliocentric ecliptic J2000 = −(Sun geocentric)
      var ex = -r * math.cos(lam)
      var ey = -r * math.sin(lam)
      var ez = 0.0
      // circular giant planets: (a au, period d, L₀ deg at J2000, m/m☉)
      val planets = Seq(
        (5.2029, 4332.589, 34.396, 1.0 / 1047.35),
        (9.5367, 10759.22, 49.954, 1.0 / 3497.9),
        (19.189, 30685.4, 313.238, 1.0 / 22903.0),
        (30.070, 60189.0, 304.880, 1.0 / 19412.0))
      planets.foreach { case (a, per, l0, mu) =>
        val lp = math.toRadians(l0) + 2 * math.Pi * d / per
        ex -= mu * a * math.cos(lp)
        ey -= mu * a * math.sin(lp)
      }
      val eps = math.toRadians(23.4392911)
      val (x, y, z) = (ex, ey * math.cos(eps) - ez * math.sin(eps),
        ey * math.sin(eps) + ez * math.cos(eps))
      val ra = math.toRadians(raDeg); val dec = math.toRadians(decDeg)
      (math.cos(dec) * math.cos(ra) * x + math.cos(dec) * math.sin(ra) * y +
        math.sin(dec) * z) * 499.004784
    }
    val gen = for {
      jd <- Gen.chooseNum(2450000.0, 2470000.0)
      ra <- Gen.chooseNum(0.0, 360.0)
      dec <- Gen.chooseNum(-90.0, 90.0)
    } yield (jd, ra, dec)
    check("baryXmodel", 300)(Prop.forAll(gen) { case (jd, ra, dec) =>
      val v = Barycenter.bjdCorrectionSeconds(jd, ra, dec)
      val k = kepler(jd, ra, dec)
      math.abs(v - k) < 1.0
    })
  }

  test("np.roll key rewrite is a bijection on the grid") {
    val gen = for {
      w <- Gen.choose(1, 32)
      h <- Gen.choose(1, 32)
      sx <- Gen.choose(-40, 40)
      sy <- Gen.choose(-40, 40)
    } yield (w, h, sx, sy)
    check("roll", 300)(Prop.forAll(gen) { case (w, h, sx, sy) =>
      // pmod semantics used by alignAndCombine's roll projection
      def pmod(a: Int, m: Int) = ((a % m) + m) % m
      val mapped = for (y <- 0 until h; x <- 0 until w)
        yield (pmod(y + sy, h), pmod(x + sx, w))
      mapped.distinct.size == w * h // bijective: no pixel lost or doubled
    })
  }

  test("rank trim drops exactly 10 rows when n > 10, none otherwise") {
    val gen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))
    check("trim", 200)(Prop.forAll(gen) { vs =>
      // the reference's two-sided trim rule (core.py:339): remove the 5
      // brightest and 5 dimmest only when more than 10 rows survive it
      val n = vs.length
      val kept =
        if (n <= 10) n
        else n - 10
      val ranked = vs.sorted
      val survivors = if (n <= 10) ranked else ranked.slice(5, n - 5)
      survivors.length == kept &&
        (n <= 10 || survivors.forall(v =>
          v >= ranked(4) && v <= ranked(n - 5)))
    })
  }

  test("PGM codec round-trips arbitrary grids within one quantization step") {
    import graft.multimodal.Codecs
    val gen = for {
      w <- Gen.chooseNum(1, 12)
      h <- Gen.chooseNum(1, 12)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0.0, 1.0))
    } yield (w, h, px.toArray)
    check("pgm", 200)(Prop.forAll(gen) { case (w, h, px) =>
      val Some((dw, dh, dec)) = Codecs.decodePgm(Codecs.encodePgm(w, h, px))
      dw == w && dh == h && dec.length == px.length &&
        // 8-bit quantizer: error bounded by half a step
        dec.zip(px).forall { case (d, o) => math.abs(d - o) <= 0.5 / 255 + 1e-12 }
    })
  }

  test("WAV codec round-trips arbitrary PCM16 samples within one step") {
    import graft.multimodal.Codecs
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      s <- Gen.nonEmptyListOf(Gen.chooseNum(-1.0, 1.0))
    } yield (rate, s.toArray)
    check("wav", 200)(Prop.forAll(gen) { case (rate, s) =>
      val Some((dr, dec)) = Codecs.decodeWav(Codecs.encodeWav(rate, s))
      dr == rate && dec.length == s.length &&
        // ×32767 encode / ÷32768 decode asymmetry: ≤ 1/32768 + half-step
        dec.zip(s).forall { case (d, o) =>
          math.abs(d - o) <= 1.0 / 32768 + 0.5 / 32767 + 1e-12 }
    })
  }

  test("FITS header cards round-trip arbitrary keyword/value pairs") {
    val key = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaUpperChar).map(_.mkString))
    val value = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check("fits-cards", 200)(Prop.forAll(key, value) { (k, v) =>
      val cards =
        (s"${"SIMPLE".padTo(8, ' ')}= T".padTo(80, ' ') +
          s"${"BITPIX".padTo(8, ' ')}= 8".padTo(80, ' ') +
          s"${"NAXIS".padTo(8, ' ')}= 0".padTo(80, ' ') +
          s"${k.padTo(8, ' ')}= $v".padTo(80, ' ') +
          "END".padTo(80, ' ')).getBytes("US-ASCII")
      val block = cards ++ Array.fill[Byte](2880 - cards.length)(' '.toByte)
      val hdus = graft.sources.Fits.parseHdus(block)
      hdus.nonEmpty && hdus.head.header.get(k).contains(v)
    })
  }
}

/** Spark-backed properties: fewer samples, each case is a distributed job. */
class SparkPropertySpec extends SparkSpec {
  import graft.operators.SpatialJoins
  import spark.implicits._

  private def check(name: String, samples: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(samples)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)),
      p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("grid-bucketed NN join equals brute force on random point sets") {
    val pointGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(0.0, 100.0)))
    check("nn-brute", 6)(Prop.forAll(pointGen, pointGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("lid", "lx", "ly")
      val right = rs.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("rid", "rx", "ry")
      val got = SpatialJoins.nearestNeighbor(
        left, "lid", "lx", "ly", right, "rid", "rx", "ry", 15.0)
        .select("left_id", "right_id").as[(Long, Long)].collect().toMap
      // brute force on the driver
      val want = ls.zipWithIndex.flatMap { case ((x, y), i) =>
        val cands = rs.zipWithIndex
          .map { case ((rx, ry), j) =>
            (j, math.sqrt((x - rx) * (x - rx) + (y - ry) * (y - ry))) }
          .filter(_._2 < 15.0)
        if (cands.isEmpty) None
        else Some(i.toLong -> cands.minBy(c => (c._2, c._1))._1.toLong)
      }.toMap
      got == want
    })
  }

  test("FITS write/read round-trips random pixel grids exactly") {
    import graft.sources.Fits
    val gen = for {
      w <- Gen.choose(1, 8)
      h <- Gen.choose(1, 8)
      vs <- Gen.listOfN(w * h, Gen.chooseNum(-1e6, 1e6))
    } yield (w, h, vs)
    check("fits-roundtrip", 5)(Prop.forAll(gen) { case (w, h, vs) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-fits")
      val px = (for (y <- 0 until h; x <- 0 until w)
        yield (y.toLong, x.toLong, vs(y * w + x))).toDF("y", "x", "v")
      val path = dir.resolve("rt.fits").toString
      Fits.writeFits(px, w, h,
        Seq(Map("AIRMASS" -> "1.0", "EXPTIME" -> "1.0",
          "DATE-OBS" -> "2020-01-01T00:00:00.000")),
        Map.empty, 0.0, 0.0, path)
      val back = Fits.readFits(spark, path, hduIndex = 0)
        .select("y", "x", "v").as[(Long, Long, Double)].collect()
        .map { case (y, x, v) => (y, x) -> v }.toMap
      (0 until h).forall(y => (0 until w).forall(x =>
        back((y.toLong, x.toLong)) == vs(y * w + x)))
    })
  }

  test("set-operation algebra holds on random multisets") {
    val gen = Gen.listOfN(30, Gen.choose(0, 9))
    check("set-alg", 6)(Prop.forAll(gen, gen) { (as, bs) =>
      val a = as.toDF("v"); val b = bs.toDF("v")
      val unionAll = a.unionAll(b).count() == as.length + bs.length
      val exceptSelf = a.exceptAll(a).count() == 0L
      val interBound = a.intersectAll(b).count() <=
        math.min(as.length, bs.length).toLong
      val distinctBound = a.union(b).distinct().count() ==
        (as.toSet ++ bs.toSet).size.toLong
      unionAll && exceptSelf && interBound && distinctBound
    })
  }
}
