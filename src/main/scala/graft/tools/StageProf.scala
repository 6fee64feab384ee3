package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: run one query and print, per stage, the task count, total
  * task time, and max single-task time — the direct view of the
  * "1 task on a 32-core box" underutilization an unsplittable
  * single-row-group fixture scan produces (optimization guide §2.5).
  * Usage: runMain graft.tools.StageProf <query> [reps]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(var n: Int = 0, var totalMs: Long = 0,
      var maxMs: Long = 0, var runMs: Long = 0, var gcMs: Long = 0,
      var deserMs: Long = 0, var name: String = "")
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobEnds = mutable.ArrayBuffer.empty[(Int, Long)]
    var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collect) stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageId, St())
          s.n += 1
          val ms = e.taskInfo.duration
          s.totalMs += ms
          if (ms > s.maxMs) s.maxMs = ms
          Option(e.taskMetrics).foreach { m =>
            s.runMs += m.executorRunTime
            s.gcMs += m.jvmGCTime
            s.deserMs += m.executorDeserializeTime
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collect) stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, St()).name =
            e.stageInfo.name.take(90)
        }
    })

    // poor-man's sampling profiler: while the warm rep runs, sample all
    // "Executor task launch" threads' top frames every 50 ms
    val frames = mutable.HashMap.empty[String, Int].withDefaultValue(0)
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
              // first graft/spark frame below any glue
              val f = st.take(25).find(e =>
                !e.getClassName.startsWith("java.") &&
                !e.getClassName.startsWith("scala.")).getOrElse(st.head)
              frames.synchronized {
                frames(s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}") += 1
              }
            }
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    (1 to reps).foreach { i =>
      stages.clear()
      collect = i == reps // profile only the warm (last) rep
      sampling = collect
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      sampling = false
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== rep $i: $wall%.2f s ($n rows)")
      if (collect) {
        // let straggler task-end events drain
        Thread.sleep(300)
        println(f"${"stage"}%6s ${"tasks"}%6s ${"total_s"}%8s ${"max_s"}%7s ${"run_s"}%7s ${"gc_s"}%6s ${"deser_s"}%7s  name")
        stages.toSeq.sortBy(-_._2.totalMs).take(30).foreach { case (id, s) =>
          println(f"$id%6d ${s.n}%6d ${s.totalMs / 1e3}%8.2f ${s.maxMs / 1e3}%7.2f ${s.runMs / 1e3}%7.2f ${s.gcMs / 1e3}%6.2f ${s.deserMs / 1e3}%7.2f  ${s.name}")
        }
        val totalTask = stages.values.map(_.totalMs).sum / 1e3
        println(f"stages=${stages.size} total task time $totalTask%.2f s " +
          f"(parallel efficiency ${totalTask / wall / cpus.toDouble * 100}%.0f%% of $cpus cores)")
        println("top sampled executor frames:")
        frames.synchronized {
          frames.toSeq.sortBy(-_._2).take(15).foreach { case (f, c) =>
            println(f"  $c%5d  $f")
          }
          frames.clear()
        }
      }
    }
    spark.stop()
  }
}
