package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY.md §8 scale notes).
  *
  * Salting splits a hot group key across `saltFactor` sub-keys so no
  * single task owns the whole group; a second aggregation merges the
  * partials. Works for any algebraic aggregate; results are identical to
  * the direct aggregation (tested), only the shuffle distribution changes.
  */
object Scale {

  /** Two-phase salted sum/count aggregation over a (possibly skewed) key.
    * Phase 1 groups by (key, salt) — salt derived deterministically from a
    * row-unique column so re-runs are stable; phase 2 merges partials by
    * key. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltSource: Column, saltFactor: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))

  /** Widen an unsplittably-narrow input before CPU-heavy per-row work
    * (optimization guide §2.5, input skew: "one huge unsplittable file …
    * repartition immediately after the read"; §8: shuffle the NARROW
    * decision columns, synthesize/decode heavy payloads after).
    *
    * A single-row-group parquet file is ONE scan task no matter the core
    * count — measured 3 % parallel efficiency on the 32-core bench box
    * for the per-row codec queries. This repartitions by hash of `key`
    * (deterministic under task retry — never `rand()`, SPARK-38388) into
    * the session's default parallelism, ONLY when the input has fewer
    * partitions: at cluster scale, where scans already carry more
    * partitions than cores, it is a plan-level no-op and nothing is
    * shuffled. The explicit partition count keeps AQE from coalescing the
    * exchange back to one partition (tiny shuffle BYTES — the coalescing
    * heuristic's metric — is exactly the profile of narrow columns whose
    * per-row CPU is still expensive). Callers fan out projections of
    * scalar columns, so the exchange carries bytes-per-row in the tens. */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    // streaming relations have no static partitioning to inspect (`.rdd`
    // is illegal before start()); micro-batch sources parallelize by
    // files/offsets instead, so pass them through untouched
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
