package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev scratch: run queries in bench-like sequence to expose cross-query
  * interference (cache retention, GC pressure). */
object ProfSeq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    args.foreach(time)
    println("cached RDDs: " + spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
