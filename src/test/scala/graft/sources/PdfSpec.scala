package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural verification of the real PDF writer (write_pdf,
  * p_io.py:64-101): the emitted bytes must be a parseable PDF 1.4 —
  * header, page count, a valid startxref offset — and the embedded
  * grayscale image streams must inflate back to exactly the zscale+sqrt
  * normalized pixels. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(b: Array[Byte]) = new String(b, "ISO-8859-1")

  test("normalize: zscale bounds clip, sqrt stretch, half-up quantize") {
    val px = Array.fill(98)(10.0) ++ Array(0.0, 1000.0) // outliers clip
    val g = Pdf.normalize(px)
    // constant bulk: lo == hi == 10 at the 2/98 percentiles -> span guard,
    // bulk maps to 0; the high outlier saturates
    assert(g.length === 100)
    assert(g.map(_ & 0xff).max === 255)
    val ramp = Array.tabulate(101)(_ / 100.0)
    val gru = Pdf.normalize(ramp).map(_ & 0xff)
    assert(gru.min === 0 && gru.max === 255)
    // monotone non-decreasing under sqrt stretch
    assert(gru.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("writeReport emits a parseable PDF: pages, xref, inflatable images") {
    val img = Pdf.GrayImage("epoch 1", 8, 6,
      Array.tabulate(48)(i => i.toDouble))
    val model = Pdf.GrayImage("", 5, 5, Array.tabulate(25)(i => (i % 7).toDouble))
    val cuts = (1 to 3).map { k =>
      (Pdf.GrayImage(s"star $k", 5, 5, Array.tabulate(25)(i => (i * k).toDouble)),
       Pdf.GrayImage("", 5, 5, Array.fill(25)(0.1 * k)), 100.0 * k)
    }
    val path = Files.createTempFile("graft-report", ".pdf").toString
    Pdf.writeReport(path, Seq(img), Some(model), cuts)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val s = ascii(bytes)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.trim.endsWith("%%EOF"))
    // 1 frame page + 1 model page + 1 grid page (3 pairs < pairsPerPage)
    assert("/Type /Page[^s]".r.findAllIn(s).length === 3)
    assert("/Type /Pages".r.findAllIn(s).length === 1)
    assert(s.contains("/Count 3"))
    // startxref points at the xref table
    val xrefOff = s.split("startxref\n")(1).split("\n")(0).trim.toInt
    assert(ascii(bytes.slice(xrefOff, xrefOff + 4)) === "xref")
    // first image stream inflates to the normalized frame pixels
    val imgDictAt = s.indexOf("/Subtype /Image")
    val streamAt = s.indexOf("stream\n", imgDictAt) + "stream\n".length
    val lenStr = "/Length (\\d+)".r.findFirstMatchIn(s.substring(imgDictAt)).get.group(1)
    val deflated = bytes.slice(streamAt, streamAt + lenStr.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(deflated)
    val out = new Array[Byte](48)
    assert(inf.inflate(out) === 48)
    assert(out.toSeq === Pdf.normalize(img.pixels).toSeq)
    // flux captions present (escaped text objects)
    assert(s.contains("(flux 100.00)") && s.contains("(flux 300.00)"))
  }

  test("frameImages bins oversize frames distributed before the gather") {
    // 2048² frame built distributed; v encodes the 4×4 bin id so the
    // binned average must reproduce it exactly
    val side = 2048
    val px = spark.range(side.toLong * side).select(
      lit(1L).as("img_id"),
      (col("id") / side).cast("long").as("y"),
      (col("id") % side).as("x"))
      .withColumn("v",
        ((col("y") / 4).cast("long") * 512 + (col("x") / 4).cast("long"))
          .cast("double"))
    val frames = Pdf.frameImages(px, side, side)
    assert(frames.length === 1)
    val f = frames.head
    // 2048 / 512 = factor 4: the gathered grid is 512², never native size
    assert(f.width === 512 && f.height === 512)
    assert(f.pixels.length === 512 * 512)
    assert(f.pixels(0) === 0.0)
    assert(f.pixels(512 * 511 + 511) === (511.0 * 512 + 511))
    // small frames pass through at native resolution with exact values
    val small = Pdf.frameImages(px.filter(col("y") < 48 && col("x") < 48), 48, 48)
    assert(small.head.width === 48 && small.head.pixels.length === 48 * 48)
    assert(small.head.pixels(47) === 11.0) // y=0,x=47 -> bin id 11
  }

  test("cutoutImages keeps only full squares from the DataFrame boundary") {
    val df = Seq(
      (1, 500.0, 25L, (1 to 25).map(_.toDouble), (1 to 25).map(_ => 0.0)),
      (2, 400.0, 20L, (1 to 20).map(_.toDouble), (1 to 20).map(_ => 0.0)))
      .toDF("star_id", "flux", "n_px", "image_cutout", "residual_cutout")
    val cuts = Pdf.cutoutImages(df, 2)
    assert(cuts.length === 1 && cuts.head._3 === 500.0)
    assert(cuts.head._1.width === 5 && cuts.head._1.pixels.length === 25)
  }

  test("end to end: planted-field residual cutouts render to a report") {
    import graft.pipeline.{GaussianFit, Photometry}
    val rnd = new scala.util.Random(5)
    val stars = Seq((12.0, 14.0, 800.0, 1.8), (30.0, 25.0, 600.0, 1.8))
    val rows = for (y <- 0 until 48; x <- 0 until 48) yield {
      var v = 100.0 + rnd.nextGaussian()
      stars.foreach { case (sx, sy, amp, sig) =>
        v += amp * math.exp(-((x - sx) * (x - sx) + (y - sy) * (y - sy)) / (2 * sig * sig))
      }
      (1L, y.toLong, x.toLong, v)
    }
    val px = Photometry.subtractBackground(
      rows.toDF("img_id", "y", "x", "v")).localCheckpoint()
    val fwhm = 1.8 * GaussianFit.SigmaToFwhm
    val fitted = Photometry.iterativePhotometry(spark, px, fwhm, 1, 10.0)
    val psf = Photometry.GaussianPsf(1.8)
    val boxR = math.max(math.ceil(2 * fwhm).toInt, 2)
    val residual = Photometry.subtractModel(px, fitted, psf, boxR)
    val cutDf = Photometry.residualCutouts(px, residual, fitted, 2)
    val path = Files.createTempFile("graft-epoch-report", ".pdf").toString
    Pdf.writeReport(path,
      Pdf.frameImages(px, 48, 48),
      model = None,
      cutouts = Pdf.cutoutImages(cutDf, 2))
    val s = ascii(Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(s.startsWith("%PDF-1.4") && s.contains("/Subtype /Image"))
    // 1 frame page + 1 cutout grid page
    assert("/Type /Page[^s]".r.findAllIn(s).length >= 2)
  }
}
