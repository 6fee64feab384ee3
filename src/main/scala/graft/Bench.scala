package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the SF directory
  * given by SPARK_GRAFT_SF_DIR and prints one JSON line. A warm-up action
  * first touches the fixture tables so JIT/classloading cost is not charged
  * to the first query measured. Each query runs SPARK_GRAFT_BENCH_REPS
  * times (default 2) and reports the MIN: a single cold rep charges
  * suite-level GC/code-cache pressure to whichever query it lands on
  * (round-3 bench showed code-identical queries moving 0.8→7 s), and the
  * min over two reps is the steady-state number the plan actually earns. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.lineitem _, Tables.orders _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(load => load(spark, sfDir).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, times.map(_._1).min, times.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // the driver's artifact tail is capped at ~2000 chars, which truncates
    // the per-query map — persist the full line at a stable path too
    val out = java.nio.file.Paths.get("target/bench_full.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    spark.stop()
  }
}
