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
}
