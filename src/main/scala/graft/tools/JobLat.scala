package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: isolate per-job fixed latency in the bench session shape —
  * warm empty jobs over (a) 1-partition and (b) 32-partition RDDs, plus
  * (c) a 1-row DataFrame count and (d) a tiny shuffle, each timed over N
  * reps. Splits "the suite spends ~40 ms per job" into scheduling vs
  * task-count vs SQL-execution overhead. */
object JobLat {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val n = 60
    def bench(name: String)(f: => Unit): Unit = {
      (1 to 10).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/op")
    }
    val rdd1 = sc.parallelize(Seq(1), 1).cache(); rdd1.count()
    val rdd32 = sc.parallelize(1 to 32, 32).cache(); rdd32.count()
    bench("rdd 1-partition count")(rdd1.count())
    bench("rdd 32-partition count")(rdd32.count())
    val df1 = spark.range(1).toDF("v")
    bench("df range(1) count")(df1.count())
    val dfsh = spark.range(64).groupBy().sum("id")
    bench("df tiny global agg")(dfsh.collect())
    val dfgb = spark.range(64).withColumn("k", org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(8L))).groupBy("k").count()
    bench("df tiny shuffle agg (AQE)")(dfgb.collect())
    spark.stop()
  }
}
