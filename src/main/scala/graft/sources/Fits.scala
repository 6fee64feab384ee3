package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal FITS reader for the import_images boundary (core.py:18-50:
  * `fits.open(path)` → `hdu[1].data` + `hdu[1].header`), implemented
  * directly from the public FITS 4.0 standard — no external libraries:
  *
  *   - a file is a sequence of HDUs; each HDU is a header of 2880-byte
  *     blocks holding 36 80-character ASCII cards, then data padded to a
  *     2880 multiple;
  *   - a card is `KEYWORD = value / comment` (keyword in bytes 1-8, value
  *     indicator `= ` at 9-10); `END` terminates the header;
  *   - array shape comes from BITPIX (8/16/32/64 int, -32/-64 float) and
  *     NAXIS/NAXISn; data is big-endian, physical = BZERO + BSCALE·raw.
  *
  * Scale note: decode runs inside the executors (flatMap over binaryFile
  * rows), one task per file — the same parallelism the reference gets from
  * its per-epoch loop, without collecting any image to the driver. A
  * DataSource V2 TableProvider that streams blocks instead of holding the
  * file bytes is the upgrade path for frames much larger than the LCOGT
  * 4096² (~67 MB) ones.
  */
object Fits {

  final case class Hdu(header: Map[String, String], bitpix: Int,
      axes: Seq[Int], dataOffset: Int, dataLength: Int)

  private val Block = 2880
  private val Card = 80

  /** Parse one header starting at `off`; returns (cards, offset after the
    * last header block). Duplicate keywords keep the first value, matching
    * astropy's `header[key]` lookup semantics. */
  private def parseHeader(bytes: Array[Byte], off: Int): (Map[String, String], Int) = {
    val cards = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var p = off
    var done = false
    while (!done && p + Card <= bytes.length) {
      val card = new String(bytes, p, Card, "US-ASCII")
      val key = card.substring(0, 8).trim
      if (key == "END") done = true
      else if (key.nonEmpty && card.length > 10 && card.charAt(8) == '=') {
        // strip inline comment (a '/' outside a quoted string), unquote
        val raw = card.substring(10)
        val value = {
          val t = raw.trim
          if (t.startsWith("'")) {
            val end = t.indexOf('\'', 1)
            if (end > 0) t.substring(1, end).trim else t
          } else {
            val slash = t.indexOf('/')
            (if (slash >= 0) t.substring(0, slash) else t).trim
          }
        }
        if (!cards.contains(key)) cards(key) = value
      }
      p += Card
    }
    // advance to the end of the current 2880 block
    val headerEnd = off + ((p - off + Block - 1) / Block) * Block
    (cards.toMap, headerEnd)
  }

  /** Split a FITS byte array into its HDUs (primary + extensions). */
  def parseHdus(bytes: Array[Byte]): Seq[Hdu] = {
    val out = Seq.newBuilder[Hdu]
    var off = 0
    while (off + Block <= bytes.length) {
      val (header, dataOff) = parseHeader(bytes, off)
      val bitpix = header.get("BITPIX").map(_.toInt).getOrElse(8)
      val naxis = header.get("NAXIS").map(_.toInt).getOrElse(0)
      val axes = (1 to naxis).map(i => header(s"NAXIS$i").toInt)
      val dataLen = if (naxis == 0) 0
        else axes.product * (math.abs(bitpix) / 8)
      out += Hdu(header, bitpix, axes, dataOff, dataLen)
      off = dataOff + ((dataLen + Block - 1) / Block) * Block
    }
    out.result()
  }

  /** Decode an image HDU's data to physical values, row-major. */
  def pixelValues(bytes: Array[Byte], hdu: Hdu): Array[Double] = {
    val n = if (hdu.axes.isEmpty) 0 else hdu.axes.product
    val bscale = hdu.header.get("BSCALE").map(_.toDouble).getOrElse(1.0)
    val bzero = hdu.header.get("BZERO").map(_.toDouble).getOrElse(0.0)
    val buf = ByteBuffer.wrap(bytes, hdu.dataOffset, hdu.dataLength)
      .order(ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val raw = hdu.bitpix match {
        case 8   => (buf.get() & 0xff).toDouble
        case 16  => buf.getShort().toDouble
        case 32  => buf.getInt().toDouble
        case 64  => buf.getLong().toDouble
        case -32 => buf.getFloat().toDouble
        case -64 => buf.getDouble()
        case b   => throw new IllegalArgumentException(s"BITPIX $b unsupported")
      }
      out(i) = bzero + bscale * raw
      i += 1
    }
    out
  }

  /** import_images as a Spark scan: binaryFile glob → per-file decode of
    * `hdu(hduIndex)` → long-form pixels (img path, y, x, physical value)
    * plus the header map — abstraction #1 + #2 of SURVEY.md §1 in one
    * DataFrame. 2-D image HDUs only (NAXIS1 = width, NAXIS2 = height). */
  def readFits(spark: SparkSession, path: String, hduIndex: Int = 1): DataFrame = {
    import spark.implicits._
    CatalogSinks.readBinary(spark, path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val hdus = parseHdus(bytes)
        if (hduIndex >= hdus.length) Iterator.empty
        else {
          val hdu = hdus(hduIndex)
          require(hdu.axes.length == 2, s"HDU $hduIndex is not a 2-D image")
          val Seq(w, h) = hdu.axes
          val v = pixelValues(bytes, hdu)
          (0 until h).iterator.flatMap { y =>
            (0 until w).iterator.map { x =>
              (p, hdu.header, y.toLong, x.toLong, v(y * w + x))
            }
          }
        }
      }
      .toDF("img_id", "header", "y", "x", "v")
  }

  /** Header promotion (p_io.py:43-56): the typed columns the pipeline
    * consumes, pulled out of the header map. */
  def promoteHeader(df: DataFrame): DataFrame =
    df.select(col("*"),
      element_at(col("header"), "AIRMASS").cast("double").as("airmass"),
      element_at(col("header"), "EXPTIME").cast("double").as("exptime"),
      element_at(col("header"), "DATE-OBS").as("date_obs"),
      element_at(col("header"), "SITEID").as("site_id"),
      element_at(col("header"), "FILTER").as("filter"))
}
