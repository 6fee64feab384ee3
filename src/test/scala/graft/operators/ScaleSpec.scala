package graft.operators


import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregate equals direct aggregation on skewed keys") {
    // one hot key owning 90% of rows
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
      (i.toLong, k, (i % 100).toDouble)
    }
    val df = rows.toDF("id", "k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("sum_value"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    val salted = Scale.saltedSumCount(df, $"k", $"v", $"id", 16)
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 === n)
      assert(math.abs(salted(k)._1 - s) < 1e-6)
    }
  }
}

/** Bucketing demo: pre-bucketed tables joined on the bucket key produce a
  * shuffle-free sort-merge join — the co-located-join technique for
  * repeated large joins at 100 TB. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables has no exchange") {
    // warehouse dir is a static conf — set via build.sbt javaOptions
    val left = (1L to 2000L).map(i => (i, i * 2.0)).toDF("key", "lv")
    val right = (1L to 2000L).map(i => (i, s"r$i")).toDF("key", "rv")
    left.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("b_left")
    right.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("b_right")
    val joined = spark.table("b_left").join(spark.table("b_right"), "key")
    // force SMJ so the bucket layout (not a broadcast) carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.table("b_left").join(spark.table("b_right"), "key")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
