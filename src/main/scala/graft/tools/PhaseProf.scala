package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: split each query's wall-clock into driver-side planning
  * (QueryPlanningTracker phases) vs scheduled task time vs the residual
  * (AQE re-planning, job-submission latency, codegen compilation, result
  * handling) — the view needed to attack the ~130-query sub-0.3 s tail,
  * whose cost round 15 attributed to "driver latency" without a split.
  * Usage: runMain graft.tools.PhaseProf <query...> (reps via
  * SPARK_GRAFT_PHASE_REPS, default 2; prints the LAST rep, i.e. warm). */
object PhaseProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PHASE_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(graft.Tables.lineitem _, graft.Tables.orders _, graft.Tables.events _,
      graft.Tables.documents _, graft.Tables.embeddings _)
      .foreach(load => load(spark, dir).count())

    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null)
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
        ()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println("query,wall_ms,analysis_ms,optimization_ms,planning_ms,task_ms,jobs")
    names.foreach { name =>
      var line = ""
      (1 to reps).foreach { _ =>
        taskMs.set(0); jobs.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.count()
        val wall = (System.nanoTime() - t0) / 1e6
        Thread.sleep(50) // let the async listener bus drain
        val ph = df.queryExecution.tracker.phases
        def ms(k: String): Long = ph.get(k).map(_.durationMs).getOrElse(0L)
        line = f"$name,${wall}%.0f,${ms("analysis")},${ms("optimization")},${ms("planning")},${taskMs.get},${jobs.get}"
      }
      println(line)
    }
    spark.stop()
  }
}
