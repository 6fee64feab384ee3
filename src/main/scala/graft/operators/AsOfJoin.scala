package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (`ens_match` / time-series alignment surface, SURVEY.md §2.3):
  * for each left row, the latest right row with the same key and
  * `right.ts <= left.ts`.
  *
  * Implemented without any join: both sides are unioned, sorted within each
  * key by (ts, side, tiebreak), and the right payload is carried forward
  * with `last(..., ignoreNulls)` over a running window. One shuffle on the
  * key, O(n log n) per partition — no cross product, no range explosion, so
  * it holds at 100 TB where a naive inequality join would not. Right rows
  * sort before left rows at equal timestamps, making the match inclusive
  * (ts_right == ts_left matches), and the tiebreak id makes equal-timestamp
  * right rows resolve to the largest id deterministically.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param key        equality key column present on both sides
    * @param ts         event-time column present on both sides
    * @param tieBreak   unique id column present on both sides (determinism)
    * @param rightCols  right payload columns to attach (emitted as asof_<c>)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieBreak: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val r = right.select(col(key), col(ts), col(tieBreak),
      payload.as("_asof_payload"), lit(0).as("_side"))
    val leftCols = left.columns
    val l = left.withColumn("_asof_payload",
        lit(null).cast(r.schema("_asof_payload").dataType))
      .withColumn("_side", lit(1))
      .select(r.columns.map(col) ++ leftCols.filterNot(
        c => c == key || c == ts || c == tieBreak).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = matched.select(
      leftCols.map(col) ++
        rightCols.map(c => col(s"_match.$c").as(s"asof_$c")): _*)
    out
  }
}
