package graft.tools

import graft.pipeline.{EpochPipeline, Photometry}
import graft.operators.{RankTrim, SpatialJoins}
import org.apache.spark.sql.functions._

/** Stage-level timing of the q83 epoch pipeline on the rendered fixture
  * field — a diagnostic main for finding which pass dominates wall time. */
object ProfEpoch {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    def t[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val s0 = stages.get()
      val s = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - s) / 1e9}%.2f s  " +
        f"jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
      r
    }
    for (rep <- 1 to 2) {
      println(s"rep $rep")
      val field = graft.queries.PixelQueries.fieldFor(spark, sf)
      val pinned = t("pin")(field.localCheckpoint())
      val n = t("nImages")(pinned.select(col("img_id")).distinct().count())
      val combined = pinned.select(lit(0L).as("img_id"), col("y"), col("x"), col("v"))
      val baseStats = t("backgroundStats")(
        Photometry.backgroundStats(combined, bufferable = true).cache())
      val sub = t("subtract+pin")(
        combined.join(broadcast(baseStats), Seq("img_id"))
          .select(col("img_id"), col("y"), col("x"),
            (col("v") - col("bkg_median")).as("v")).localCheckpoint())
      val subStats = baseStats.select(col("img_id"),
        (col("bkg_mean") - col("bkg_median")).as("bkg_mean"),
        lit(0.0).as("bkg_median"), col("bkg_std"))
      val bright = sub.join(broadcast(subStats), Seq("img_id"))
        .filter(col("v") > col("bkg_median") + lit(10.0) * col("bkg_std"))
        .select(col("img_id"), col("x").cast("double").as("xcentroid"),
          col("y").cast("double").as("ycentroid"), col("v").as("peak"))
      val fwhm = t("findFwhm")(EpochPipeline.findFwhm(spark, sub, bright))
      println(s"  candidates=${bright.count()}")
      val detected = t("detect(mask)+pin")(
        Photometry.detectStars(sub, 10.0,
          math.max(math.ceil(fwhm).toInt, 3), Double.MaxValue, 0, 0L, 0L,
          Some(subStats)).localCheckpoint())
      val uncrowded = SpatialJoins.crowdingAnti(
        detected.withColumn("sid", col("star_id")),
        "sid", "xcentroid", "ycentroid", 5 * fwhm)
      val masked = t("crowd+trim+pin")(RankTrim.trim(uncrowded,
        Seq(col("img_id")), col("flux"), Seq(col("star_id")), 5, 10)
        .localCheckpoint())
      t("masked.count")(masked.count())
      val boxR = math.max(math.ceil(2 * fwhm).toInt, 2)
      val epsf = t("buildEpsfIterative")(
        Photometry.buildEpsfIterative(sub, masked, boxR, 2))
      val psf = t("collectGridPsf")(Photometry.collectGridPsf(epsf, boxR, 2))
      val results = t("iterativePhotometry")(
        Photometry.iterativePhotometryWithPsf(spark, sub, psf, boxR, 2, 10.0,
          Some(subStats)).localCheckpoint())
      val annulus = t("annulus")(Photometry.annulusBackground(combined,
        results.select(col("img_id"),
          monotonically_increasing_id().cast("int").as("star_id"),
          col("x_fit").as("xcentroid"), col("y_fit").as("ycentroid")),
        2 * fwhm, 3 * fwhm).count())
      println(s"  n=$n fwhm=$fwhm rows=${results.count()}")
    }
    spark.stop()
  }
}
