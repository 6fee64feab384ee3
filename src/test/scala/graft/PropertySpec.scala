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
      // aphelion is 1.0167 au ≈ 508.3 light-seconds
      math.abs(Barycenter.bjdCorrectionSeconds(jd, ra, dec)) <= 509.0
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
