package graft.tools

import graft.operators.Dedup
import graft.Tables
import org.apache.spark.sql.SparkSession

object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("tokens only") {
      import org.apache.spark.sql.functions._
      docs.select(explode(graft.functions.TextFunctions.tokens(col("text")))).count()
    }
    time("shingleSet count") {
      Dedup.shingleSet(docs, "doc_id", "text", 3).count()
    }
    time("full q61 (fresh session state)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6).count()
    }
    spark.stop()
  }
}
