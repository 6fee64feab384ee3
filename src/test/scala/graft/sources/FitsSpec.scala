package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-trips synthetic FITS files built card-by-card from the public
  * standard: primary HDU with no data + image extension in HDU 1, exactly
  * the layout import_images consumes (core.py:45-46). */
class FitsSpec extends SparkSpec {
  import spark.implicits._

  private def card(k: String, v: String): Array[Byte] =
    (k.padTo(8, ' ') + "= " + v).padTo(80, ' ').getBytes("US-ASCII")
  private def commentCard(text: String): Array[Byte] =
    text.padTo(80, ' ').getBytes("US-ASCII")

  private def block(cards: Array[Byte]*): Array[Byte] = {
    val joined = cards.flatten.toArray
    joined ++ Array.fill[Byte]((2880 - joined.length % 2880) % 2880)(' '.toByte)
  }

  private def padData(data: Array[Byte]): Array[Byte] =
    data ++ Array.fill[Byte]((2880 - data.length % 2880) % 2880)(0)

  /** 3 rows × 4 cols float32 image, values v(y,x) = 10*y + x + 0.5. */
  private def floatImageFits: Array[Byte] = {
    val primary = block(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      commentCard("END"))
    val data = ByteBuffer.allocate(12 * 4).order(ByteOrder.BIG_ENDIAN)
    for (y <- 0 until 3; x <- 0 until 4) data.putFloat(10f * y + x + 0.5f)
    val ext = block(
      card("XTENSION", "'IMAGE   '"), card("BITPIX", "-32"),
      card("NAXIS", "2"), card("NAXIS1", "4"), card("NAXIS2", "3"),
      card("AIRMASS", "1.25 / air mass at start"),
      card("EXPTIME", "30.0"),
      card("DATE-OBS", "'2020-01-01T12:00:00.000'"),
      card("SITEID", "'lsc     ' / site"),
      card("FILTER", "'V       '"),
      commentCard("END"))
    primary ++ ext ++ padData(data.array())
  }

  /** Same grid as int16 with BSCALE=0.5, BZERO=100. */
  private def scaledIntFits: Array[Byte] = {
    val primary = block(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      commentCard("END"))
    val data = ByteBuffer.allocate(6 * 2).order(ByteOrder.BIG_ENDIAN)
    for (i <- 0 until 6) data.putShort((i * 2).toShort)
    val ext = block(
      card("XTENSION", "'IMAGE   '"), card("BITPIX", "16"),
      card("NAXIS", "2"), card("NAXIS1", "3"), card("NAXIS2", "2"),
      card("BSCALE", "0.5"), card("BZERO", "100.0"),
      commentCard("END"))
    primary ++ ext ++ padData(data.array())
  }

  test("float32 image extension decodes to long-form pixels with header") {
    val dir = Files.createTempDirectory("graft-fits")
    Files.write(dir.resolve("epoch1.fits"), floatImageFits)
    val df = Fits.readFits(spark, dir.toString + "/*.fits", hduIndex = 1)
    assert(df.count() === 12)
    val v = df.filter($"y" === 2 && $"x" === 3).select("v").as[Double].head()
    assert(math.abs(v - 23.5) < 1e-6)
    val promoted = Fits.promoteHeader(df).select("airmass", "exptime",
      "date_obs", "site_id", "filter").distinct().collect()
    assert(promoted.length === 1)
    val r = promoted.head
    assert(r.getDouble(0) === 1.25 && r.getDouble(1) === 30.0)
    assert(r.getString(2) === "2020-01-01T12:00:00.000")
    assert(r.getString(3) === "lsc" && r.getString(4) === "V")
  }

  test("int16 data applies BSCALE/BZERO scaling") {
    val dir = Files.createTempDirectory("graft-fits16")
    Files.write(dir.resolve("cal.fits"), scaledIntFits)
    val df = Fits.readFits(spark, dir.toString + "/*.fits", hduIndex = 1)
    // raw = 0,2,4,... → physical = 100 + 0.5*raw
    val vals = df.orderBy("y", "x").select("v").as[Double].collect().toSeq
    assert(vals === (0 until 6).map(i => 100.0 + 0.5 * (i * 2)))
  }

  test("write_fits: WCS-merged header, mean airmass, BJD, primary-HDU round-trip") {
    val dir = Files.createTempDirectory("graft-fits-w")
    val px = (for (y <- 0L until 2L; x <- 0L until 3L)
      yield (y, x, (y * 3 + x).toDouble)).toDF("y", "x", "v")
    val h1 = Map("AIRMASS" -> "1.2", "EXPTIME" -> "30.0",
      "DATE-OBS" -> "2020-01-01T12:00:00.000", "SITEID" -> "lsc",
      "CRVAL1" -> "0.0")
    val h2 = Map("AIRMASS" -> "1.4", "EXPTIME" -> "30.0",
      "DATE-OBS" -> "2020-01-01T12:10:00.000", "SITEID" -> "lsc")
    val wcs = Map("CRVAL1" -> "150.125", "HISTORY" -> "solved", "COMMENT" -> "x")
    val out = dir.resolve("composite.fits").toString
    val (airmass, bjd, merged) = Fits.writeFits(px, 3, 2, Seq(h1, h2), wcs,
      raDeg = 150.125, decDeg = -32.5, path = out)
    assert(math.abs(airmass - 1.3) < 1e-12)
    assert(merged("CRVAL1") === "150.125") // WCS overwrites (p_io.py:40-42)
    assert(!merged.contains("HISTORY") && !merged.contains("COMMENT"))
    // mid-exposure mean: 12:05:15 UTC on 2020-01-01 → JD, then BJD offset
    val expectedJd = (1577880315.0 / 86400.0) + 2440587.5
    assert(math.abs(bjd - expectedJd) < 0.01, s"bjd $bjd vs ~$expectedJd")
    // round-trip through the reader: primary HDU carries the data
    val back = Fits.readFits(spark, out, hduIndex = 0)
    assert(back.count() === 6)
    assert(back.filter($"y" === 1 && $"x" === 2).select("v").as[Double].head() === 5.0)
    val hdr = back.select("header").head().getMap[String, String](0)
    assert(math.abs(hdr("AIRMASS").toDouble - 1.3) < 1e-12)
  }

  test("write_fits streams: sparse zero-fill, bounds filter, duplicate last-wins") {
    val dir = Files.createTempDirectory("graft-fits-sparse")
    // 4×3 frame with only 3 cells present, one out-of-bounds row, and a
    // duplicated position — the streaming writer must zero-fill gaps,
    // drop out-of-bounds, and coalesce duplicates into ONE cell: (1,0)
    // appears twice (equal values: tie order under sort is
    // nondeterministic), and the cursor must not advance twice, which
    // would shift every later pixel
    val px = Seq(
      (0L, 1L, 2.5), (2L, 3L, 7.0), (1L, 0L, -1.5), (1L, 0L, -1.5),
      (9L, 9L, 99.0), (-1L, 0L, 42.0)).toDF("y", "x", "v")
    val h = Map("AIRMASS" -> "1.0", "EXPTIME" -> "10.0",
      "DATE-OBS" -> "2020-01-01T00:00:00.000")
    val out = dir.resolve("sparse.fits").toString
    Fits.writeFits(px, 4, 3, Seq(h), Map.empty, 10.0, 20.0, out)
    val back = Fits.readFits(spark, out, hduIndex = 0)
    assert(back.count() === 12)
    val vals = back.orderBy("y", "x").select("v").as[Double].collect().toSeq
    assert(vals === Seq(0.0, 2.5, 0.0, 0.0, -1.5, 0.0, 0.0, 0.0,
      0.0, 0.0, 0.0, 7.0))
  }

  test("write_fits streams a 2048-square frame without a full-frame collect") {
    // 4.2 M pixel rows; the writer pulls range-sorted partitions through
    // toLocalIterator, so driver-resident rows at any instant are one
    // shuffle partition (~total/32), not the frame
    val n = 2048
    val dir = Files.createTempDirectory("graft-fits-stream")
    val px = spark.range(n.toLong * n)
      .select(($"id" / n).cast("long").as("y"), ($"id" % n).cast("long").as("x"),
        (($"id" % 1000L) * 0.25).as("v"))
    val h = Map("AIRMASS" -> "1.1", "EXPTIME" -> "30.0",
      "DATE-OBS" -> "2020-01-01T00:00:00.000")
    val out = dir.resolve("big.fits").toString
    Fits.writeFits(px, n, n, Seq(h), Map.empty, 0.0, 0.0, out)
    assert(Files.size(java.nio.file.Paths.get(out)) >= n.toLong * n * 8)
    val back = spark.read.format("graft.sources.FitsTableProvider")
      .option("hdu", "0").load(out)
    val total = n.toLong * n
    val cycles = total / 1000; val rem = (total % 1000).toInt
    val expected = cycles.toDouble * (999.0 * 1000 / 2 * 0.25) +
      (0 until rem).map(_ * 0.25).sum
    val agg = back.agg(count(lit(1)), sum(col("v")))
      .as[(Long, Double)].head()
    assert(agg._1 === total && agg._2 === expected)
    val corner = back.filter(col("y") === n - 1 && col("x") === n - 1)
      .select("v").as[Double].head()
    assert(corner === ((total - 1) % 1000L) * 0.25)
    Files.deleteIfExists(java.nio.file.Paths.get(out))
  }

  test("DataSource V2 connector: glob scan, pruning, parity with flatMap reader") {
    val dir = Files.createTempDirectory("graft-fits-dsv2")
    Files.write(dir.resolve("a.fits"), floatImageFits)
    Files.write(dir.resolve("b.fits"), scaledIntFits)
    val df = spark.read.format("graft.sources.FitsTableProvider")
      .option("hdu", "1").load(dir.toString + "/*.fits")
    // cardinality: 12 px (3x4 float) + 6 px (2x3 int16) over 2 partitions
    assert(df.count() === 18)
    assert(df.rdd.getNumPartitions === 2)
    // values match the flatMap-based reader exactly
    val v1 = df.filter(col("img_id").contains("a.fits"))
      .select("y", "x", "v").as[(Long, Long, Double)].collect().toSet
    val v2 = Fits.readFits(spark, dir.toString + "/a.fits")
      .select("y", "x", "v").as[(Long, Long, Double)].collect().toSet
    assert(v1 === v2)
    // header map rides along; BSCALE applied in file b
    val hdr = df.filter(col("img_id").contains("b.fits"))
      .select(element_at(col("header"), "BZERO")).distinct().as[String].head()
    assert(hdr === "100.0")
    assert(df.filter(col("img_id").contains("b.fits"))
      .agg(min("v")).as[Double].head() === 100.0)
    // column pruning reaches the scan (ReadSchema shrinks)
    val pruned = df.select("img_id")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("img_id") && !plan.contains("header"),
      s"prune not pushed:\n$plan")
  }

  test("DSv2 streams a >256 MB frame: block-wise decode, exact aggregates") {
    // 6144² float64 primary-HDU image = 302 MB of data — bigger than any
    // sane task heap slice. The reader must stream (locateHdu touches only
    // header blocks; pixels decode from ~1 MiB positioned reads); holding
    // file bytes like the flatMap path would need the whole 302 MB per
    // task. Values are (i % 1000)·0.25: ≤2 fractional bits, so the 37.7M-
    // term double sum is EXACT in any accumulation order — the aggregate
    // check is bit-tight, not approximate.
    val n = 6144
    val dir = Files.createTempDirectory("graft-fits-big")
    val f = dir.resolve("big.fits")
    val ch = java.nio.channels.FileChannel.open(f,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.write(ByteBuffer.wrap(block(
        card("SIMPLE", "T"), card("BITPIX", "-64"),
        card("NAXIS", "2"), card("NAXIS1", n.toString),
        card("NAXIS2", n.toString), commentCard("END"))))
      val rowBuf = ByteBuffer.allocate(n * 8).order(ByteOrder.BIG_ENDIAN)
      var i = 0L
      for (_ <- 0 until n) {
        rowBuf.clear()
        for (_ <- 0 until n) { rowBuf.putDouble((i % 1000L) * 0.25); i += 1 }
        rowBuf.flip(); ch.write(rowBuf)
      }
      val pad = (2880 - (n.toLong * n * 8 % 2880)) % 2880
      if (pad > 0) ch.write(ByteBuffer.allocate(pad.toInt))
    } finally ch.close()
    try {
      val df = spark.read.format("graft.sources.FitsTableProvider")
        .option("hdu", "0").load(f.toString)
      val total = n.toLong * n
      val cycles = total / 1000; val rem = (total % 1000).toInt
      val expected = cycles.toDouble * (999.0 * 1000 / 2 * 0.25) +
        (0 until rem).map(_ * 0.25).sum
      val agg = df.agg(count(lit(1)), sum(col("v")), max(col("y")), max(col("x")))
        .as[(Long, Double, Long, Long)].head()
      assert(agg._1 === total)
      assert(agg._2 === expected)
      assert(agg._3 === (n - 1).toLong && agg._4 === (n - 1).toLong)
      // spot-check the far corner (forces the last chunk's offsets right)
      val corner = df.filter(col("y") === n - 1 && col("x") === n - 1)
        .select("v").as[Double].head()
      assert(corner === ((total - 1) % 1000L) * 0.25)
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir)
    }
  }

  test("decoded pixels feed detection directly (ingest-to-operator splice)") {
    // render a tiny star field into a FITS float image, then run the
    // pipeline's detector on the decoded long form
    val primary = block(
      card("SIMPLE", "T"), card("BITPIX", "8"), card("NAXIS", "0"),
      commentCard("END"))
    val w = 32; val h = 32
    val data = ByteBuffer.allocate(w * h * 4).order(ByteOrder.BIG_ENDIAN)
    for (y <- 0 until h; x <- 0 until w) {
      val dx = x - 16.0; val dy = y - 16.0
      data.putFloat((100.0 + 2000.0 * math.exp(-(dx * dx + dy * dy) / (2 * 1.8 * 1.8))).toFloat)
    }
    val ext = block(
      card("XTENSION", "'IMAGE   '"), card("BITPIX", "-32"),
      card("NAXIS", "2"), card("NAXIS1", w.toString), card("NAXIS2", h.toString),
      commentCard("END"))
    val dir = Files.createTempDirectory("graft-fits-field")
    Files.write(dir.resolve("field.fits"), primary ++ ext ++ padData(data.array()))
    val px = Fits.readFits(spark, dir.toString + "/*.fits")
      .select(lit(1L).as("img_id"), $"y", $"x", $"v")
    val stars = graft.pipeline.Photometry.detectStars(
      graft.pipeline.Photometry.subtractBackground(px), 10.0, 3)
      .select("xcentroid", "ycentroid").as[(Double, Double)].collect()
    assert(stars.length === 1)
    assert(math.abs(stars.head._1 - 16.0) < 0.5 && math.abs(stars.head._2 - 16.0) < 0.5)
  }
}
