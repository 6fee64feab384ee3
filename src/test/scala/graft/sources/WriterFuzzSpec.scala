package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Hostile-input fuzz for the WRITERS, the counterpart of
  * CodecFuzzSpec's decoder fuzzing: pathological frames (NaN/Inf pixels,
  * zero-area and negative dims, >2³¹ virtual pixels) and malformed report
  * images must either produce a well-formed file or fail fast with a clear
  * error — never OOM, never grind through gigabytes of zero-fill, never
  * emit a structurally corrupt output that a downstream reader chokes on. */
class WriterFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val hdr = Map("AIRMASS" -> "1.2", "EXPTIME" -> "30.0",
    "DATE-OBS" -> "2020-01-01T12:00:00.000")

  test("write_fits: NaN/Inf pixels serialize losslessly, file stays well-formed") {
    val dir = Files.createTempDirectory("graft-fuzz-fits")
    val out = dir.resolve("weird.fits").toString
    val px = Seq(
      (0L, 0L, Double.NaN), (0L, 1L, Double.PositiveInfinity),
      (1L, 0L, Double.NegativeInfinity), (1L, 1L, 42.5))
      .toDF("y", "x", "v")
    Fits.writeFits(px, 2, 2, Seq(hdr), Map.empty, 0.0, 0.0, out)
    // FITS files are a whole number of 2880-byte blocks
    assert(Files.size(java.nio.file.Paths.get(out)) % 2880 === 0)
    val back = Fits.readFits(spark, out, hduIndex = 0)
      .orderBy("y", "x").select("v").as[Double].collect()
    assert(back(0).isNaN)
    assert(back(1) === Double.PositiveInfinity)
    assert(back(2) === Double.NegativeInfinity)
    assert(back(3) === 42.5)
  }

  test("write_fits: zero-area and negative dims are rejected, no file written") {
    val dir = Files.createTempDirectory("graft-fuzz-fits0")
    val px = Seq((0L, 0L, 1.0)).toDF("y", "x", "v")
    for ((w, h) <- Seq((0, 4), (4, 0), (-1, 4), (4, -3), (0, 0))) {
      val out = dir.resolve(s"z$w-$h.fits")
      intercept[IllegalArgumentException] {
        Fits.writeFits(px, w, h, Seq(hdr), Map.empty, 0.0, 0.0, out.toString)
      }
      assert(!Files.exists(out), s"rejected write ${w}x$h left a file")
    }
  }

  test("write_fits: >2^31 virtual pixels fail fast, before any I/O") {
    val dir = Files.createTempDirectory("graft-fuzz-fitsbig")
    val px = Seq((0L, 0L, 1.0)).toDF("y", "x", "v")
    val out = dir.resolve("huge.fits")
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] {
      // 2^32 virtual pixels = 34 GB of zero-fill if the guard is missing
      Fits.writeFits(px, 65536, 65536, Seq(hdr), Map.empty, 0.0, 0.0,
        out.toString)
    }
    assert((System.nanoTime() - t0) < 5e9, "oversize reject was not fast")
    assert(!Files.exists(out))
    // the boundary itself: exactly 2^31 pixels (17 GB of zero-fill) is
    // the pathology the guard documents — it must reject, not squeak by
    val atBoundary = dir.resolve("boundary.fits")
    intercept[IllegalArgumentException] {
      Fits.writeFits(px, 65536, 32768, Seq(hdr), Map.empty, 0.0, 0.0,
        atBoundary.toString)
    }
    assert(!Files.exists(atBoundary))
  }

  test("write_pdf: NaN/Inf/constant images still produce a well-formed PDF") {
    val dir = Files.createTempDirectory("graft-fuzz-pdf")
    val out = dir.resolve("weird.pdf").toString
    val nan = Pdf.GrayImage("nan", 4, 4,
      Array.tabulate(16)(i => if (i % 3 == 0) Double.NaN else i.toDouble))
    val inf = Pdf.GrayImage("inf", 4, 4,
      Array.tabulate(16)(i => if (i % 2 == 0) Double.PositiveInfinity
        else Double.NegativeInfinity))
    val flat = Pdf.GrayImage("flat", 4, 4, Array.fill(16)(7.0))
    Pdf.writeReport(out, Seq(nan, inf, flat), model = Some(flat),
      cutouts = Seq((flat, nan, 123.25)))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(new String(bytes.take(8), "US-ASCII").startsWith("%PDF-1.4"))
    assert(new String(bytes.takeRight(32), "US-ASCII").contains("%%EOF"))
  }

  test("write_pdf: zero-area or short-sampled images are rejected") {
    val dir = Files.createTempDirectory("graft-fuzz-pdf0")
    val bad = Seq(
      Pdf.GrayImage("empty", 0, 0, Array.empty[Double]),
      Pdf.GrayImage("zero-w", 0, 4, Array.empty[Double]),
      Pdf.GrayImage("short", 5, 5, Array.fill(7)(1.0)),
      Pdf.GrayImage("long", 2, 2, Array.fill(9)(1.0)))
    bad.zipWithIndex.foreach { case (img, i) =>
      intercept[IllegalArgumentException] {
        Pdf.writeReport(dir.resolve(s"bad$i.pdf").toString, Seq(img))
      }
    }
  }
}
