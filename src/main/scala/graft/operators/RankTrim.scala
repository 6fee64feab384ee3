package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided rank trim (core.py:338-340): within each group, drop the
  * `nTrim` highest and `nTrim` lowest rows by `order` — but only when the
  * group has more than `minRows` rows (the reference trims only if
  * `len(stars_tbl) > 10`, core.py:339). Tie-breaker columns make the trim
  * deterministic. One window shuffle per group key.
  */
object RankTrim {
  def trim(df: DataFrame, group: Seq[Column], order: Column,
      tieBreak: Seq[Column], nTrim: Int, minRows: Int): DataFrame = {
    val wDesc = Window.partitionBy(group: _*)
      .orderBy(order.desc +: tieBreak.map(_.asc): _*)
    val wAll = Window.partitionBy(group: _*)
    df.withColumn("_rnd", row_number().over(wDesc))
      .withColumn("_cnt", count(lit(1)).over(wAll))
      .filter(col("_cnt") <= minRows ||
        (col("_rnd") > nTrim && col("_rnd") <= col("_cnt") - nTrim))
      .drop("_rnd", "_cnt")
  }
}
