package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{avg, col}

/** REAL `write_pdf` (p_io.py:64-101): the reference's diagnostic report —
  * one page per epoch frame (zscale + sqrt-stretch normalized), an
  * optional PSF-model page, and a grid of (star, residual) cutout pairs
  * captioned by flux — written as a genuine PDF 1.4 file assembled
  * directly from the public specification: numbered objects, grayscale
  * `/FlateDecode` image XObjects (JDK Deflater), Helvetica captions, a
  * byte-exact xref table and trailer. No plotting/PDF library exists in
  * this container, so the writer IS the spec: any standard viewer renders
  * the result.
  *
  * Like `write_fits`, report assembly is a driver-side boundary: inputs
  * are model-object-sized (one combined frame, one EPSF grid, bounded
  * per-star cutouts) — the same place the reference crosses into
  * matplotlib.
  */
object Pdf {

  final case class GrayImage(label: String, width: Int, height: Int,
      pixels: Array[Double])

  /** zscale + sqrt stretch to 8-bit gray (p_io.py:68 semantics, same
    * formula as q84): contrast bounds at the 2nd/98th percentile (type-7
    * interpolation), clip to [0,1], sqrt, quantize half-up. */
  def normalize(px: Array[Double]): Array[Byte] = {
    if (px.isEmpty) return Array.empty
    val sorted = px.clone(); java.util.Arrays.sort(sorted)
    def pct(q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, sorted.length - 1)
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val lo = pct(0.02); val hi = pct(0.98)
    val span = if (hi > lo) hi - lo else 1.0
    px.map { v =>
      val unit = math.min(math.max((v - lo) / span, 0.0), 1.0)
      val g = math.floor(math.sqrt(unit) * 255.0 + 0.5).toInt
      math.min(g, 255).toByte
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Incremental PDF assembler: objects may be written in any file order;
    * the xref maps numbers to byte offsets, so ids reserve up-front and
    * bodies land when known. */
  private final class Builder {
    private val buf = new ByteArrayOutputStream()
    private val offsets = ArrayBuffer[Int]()
    buf.write("%PDF-1.4\n".getBytes(US_ASCII))

    def reserve(): Int = { offsets += -1; offsets.length }

    def write(id: Int, body: Array[Byte]): Int = {
      offsets(id - 1) = buf.size()
      buf.write(s"$id 0 obj\n".getBytes(US_ASCII))
      buf.write(body)
      buf.write("\nendobj\n".getBytes(US_ASCII))
      id
    }
    def add(body: String): Int = write(reserve(), body.getBytes(US_ASCII))

    def addStream(dict: String, data: Array[Byte]): Int = {
      val id = reserve()
      val head = s"<< $dict /Length ${data.length} >>\nstream\n".getBytes(US_ASCII)
      val body = new ByteArrayOutputStream()
      body.write(head); body.write(data)
      body.write("\nendstream".getBytes(US_ASCII))
      write(id, body.toByteArray)
    }

    def finish(path: String, catalogId: Int): Unit = {
      val xrefOff = buf.size()
      val sb = new StringBuilder()
      sb.append(s"xref\n0 ${offsets.length + 1}\n")
      sb.append("0000000000 65535 f \n")
      offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
      sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root $catalogId 0 R >>\n")
      sb.append(s"startxref\n$xrefOff\n%%EOF\n")
      buf.write(sb.toString.getBytes(US_ASCII))
      java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.toByteArray)
    }
  }

  private val PageW = 612; private val PageH = 792 // US Letter, points

  /** Write the report. `cutouts` are (star image, residual image, flux)
    * triples — `pairsPerRow` pairs per grid row, rows flowing down each
    * grid page (the reference's nrows×2 layout, p_io.py:84-99). */
  def writeReport(path: String, images: Seq[GrayImage],
      model: Option[GrayImage] = None,
      cutouts: Seq[(GrayImage, GrayImage, Double)] = Seq.empty,
      pairsPerPage: Int = 12): Unit = {
    val b = new Builder
    val catalogId = b.reserve()
    val pagesId = b.reserve()
    val fontId = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val pageIds = ArrayBuffer[Int]()

    def imageXObject(img: GrayImage): Int = {
      // a declared geometry the sample array can't fill would serialize a
      // short /Image stream — a structurally corrupt page, not an error a
      // PDF viewer reports usefully; reject it here
      require(img.width > 0 && img.height > 0,
        s"write_pdf: image '${img.label}' has empty dims " +
          s"${img.width}x${img.height}")
      require(img.pixels.length == img.width * img.height,
        s"write_pdf: image '${img.label}' has ${img.pixels.length} samples " +
          s"for ${img.width}x${img.height}")
      b.addStream(
        s"/Type /XObject /Subtype /Image /Width ${img.width} " +
          s"/Height ${img.height} /ColorSpace /DeviceGray " +
          "/BitsPerComponent 8 /Filter /FlateDecode",
        deflate(normalize(img.pixels)))
    }

    def escape(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

    def addPage(xobjs: Seq[(String, Int)], content: String): Unit = {
      val cId = b.addStream("", content.getBytes(US_ASCII))
      val xDict = xobjs.map { case (n, id) => s"/$n $id 0 R" }.mkString(" ")
      pageIds += b.add(
        s"<< /Type /Page /Parent $pagesId 0 R /MediaBox [0 0 $PageW $PageH] " +
          s"/Resources << /XObject << $xDict >> /Font << /F1 $fontId 0 R >> >> " +
          s"/Contents $cId 0 R >>")
    }

    // one page per frame: the image scaled into a 512² box + caption
    (images ++ model.map(m => m.copy(label = s"PSF Model ${m.label}".trim)))
      .foreach { img =>
        val xId = imageXObject(img)
        val size = 512.0
        val x0 = (PageW - size) / 2; val y0 = PageH - 60 - size
        addPage(Seq("Im0" -> xId),
          f"q $size%.1f 0 0 $size%.1f $x0%.1f $y0%.1f cm /Im0 Do Q\n" +
            s"BT /F1 14 Tf ${x0.toInt} ${PageH - 40} Td (${escape(img.label)}) Tj ET")
      }

    // cutout grid pages: pairs of (star, residual), flux caption per pair
    cutouts.grouped(pairsPerPage).foreach { group =>
      val cell = 110.0; val pad = 20.0
      val perRow = 2 // one (star, residual) pair per row, like the reference
      val content = new StringBuilder
      val xobjs = ArrayBuffer[(String, Int)]()
      group.zipWithIndex.foreach { case ((star, res, flux), i) =>
        val row = i / perRow; val colI = i % perRow
        val x0 = 40 + colI * (2 * cell + 3 * pad)
        val y0 = PageH - 60 - (row + 1) * (cell + 2 * pad)
        val sId = imageXObject(star); val rId = imageXObject(res)
        xobjs += (s"Im${2 * i}" -> sId); xobjs += (s"Im${2 * i + 1}" -> rId)
        content.append(
          f"q $cell%.1f 0 0 $cell%.1f $x0%.1f $y0%.1f cm /Im${2 * i} Do Q\n")
        content.append(
          f"q $cell%.1f 0 0 $cell%.1f ${x0 + cell + pad}%.1f $y0%.1f cm /Im${2 * i + 1} Do Q\n")
        content.append(
          f"BT /F1 9 Tf $x0%.1f ${y0 - 12}%.1f Td (${escape(f"flux $flux%.2f")}) Tj ET\n")
      }
      addPage(xobjs.toSeq, content.toString)
    }

    b.write(pagesId, (s"<< /Type /Pages /Kids [" +
      pageIds.map(id => s"$id 0 R").mkString(" ") +
      s"] /Count ${pageIds.length} >>").getBytes(US_ASCII))
    b.write(catalogId, s"<< /Type /Catalog /Pages $pagesId 0 R >>".getBytes(US_ASCII))
    b.finish(path, catalogId)
  }

  /** Gather report frames from long-form pixels — the driver-side
    * materialization the reference performs when handing `im_data` arrays
    * to matplotlib (psf_phot.py:55). Frames larger than `maxSide` are
    * bin-averaged DISTRIBUTED (one grouped aggregate) before the gather:
    * a report page renders at ~500 px anyway, and collecting a native
    * 4096² frame would drag ~50 M Row objects (GBs of driver heap) into
    * the driver for pixels the PDF can't show. The collected grid is
    * ≤ maxSide² cells per image regardless of frame size. */
  def frameImages(pixels: DataFrame, width: Int, height: Int,
      maxSide: Int = 512): Seq[GrayImage] = {
    val f = math.max(1,
      math.ceil(math.max(width, height).toDouble / maxSide).toInt)
    val bw = (width + f - 1) / f
    val bh = (height + f - 1) / f
    val rows = pixels
      .select(col("img_id"), (col("y") / f).cast("long").as("by"),
        (col("x") / f).cast("long").as("bx"), col("v"))
      .groupBy(col("img_id"), col("by"), col("bx"))
      .agg(avg(col("v")).as("v"))
      .collect()
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (id, rs) =>
      val px = new Array[Double](bw * bh)
      rs.foreach { r =>
        val y = r.getLong(1).toInt; val x = r.getLong(2).toInt
        if (y >= 0 && y < bh && x >= 0 && x < bw)
          px(y * bw + x) = r.getDouble(3)
      }
      GrayImage(s"image $id", bw, bh, px)
    }
  }

  /** Convert residualCutouts rows to report cutout pairs. Only complete
    * squares render (edge stars with clipped boxes are skipped, as the
    * reference's fixed-shape imshow grid assumes). */
  def cutoutImages(cutouts: DataFrame, radius: Int): Seq[(GrayImage, GrayImage, Double)] = {
    val side = 2 * radius + 1
    cutouts
      .select(col("star_id"), col("flux"), col("n_px"),
        col("image_cutout"), col("residual_cutout"))
      .collect()
      .filter(_.getLong(2) == side.toLong * side)
      .toSeq
      .map { r =>
        (GrayImage(s"star ${r.get(0)}", side, side,
           r.getSeq[Double](3).toArray),
         GrayImage("", side, side, r.getSeq[Double](4).toArray),
         r.getDouble(1))
      }
  }
}
