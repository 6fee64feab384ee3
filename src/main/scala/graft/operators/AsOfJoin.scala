package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of join (`ens_match` / time-series alignment surface, SURVEY.md §2.3):
  * for each left row, the right row with the same key that is nearest in
  * time on the requested side — backward (`right.ts <= left.ts`, the
  * default), forward (`right.ts >= left.ts`), or nearest of the two —
  * optionally bounded by a tolerance.
  *
  * Implemented without any join: both sides are unioned, sorted within each
  * key by (ts, side, tiebreak), and the right payload is carried across
  * with `last/first(..., ignoreNulls)` over a running window. One shuffle
  * on the key, O(n log n) per partition — no cross product, no range
  * explosion, so it holds at 100 TB where a naive inequality join would
  * not. Matches are inclusive at equal timestamps; equal-timestamp right
  * rows resolve deterministically (largest tiebreak backward, smallest
  * forward). `nearest` prefers the backward match on exact distance ties.
  */
object AsOfJoin {

  /** Backward as-of (compatibility signature). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieBreak: String, rightCols: Seq[String]): DataFrame =
    asOf(left, right, key, ts, tieBreak, rightCols, "backward", None)

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param key        equality key column present on both sides
    * @param ts         event-time column present on both sides
    * @param tieBreak   unique id column present on both sides (determinism)
    * @param rightCols  right payload columns to attach (emitted as asof_<c>)
    * @param direction  "backward" | "forward" | "nearest"
    * @param tolerance  max |left.ts − right.ts| for a match to count —
    *                   microseconds for timestamp columns, native units
    *                   otherwise; None = unbounded
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieBreak: String, rightCols: Seq[String], direction: String,
      tolerance: Option[Double]): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction $direction")
    val isTimestamp = right.schema(ts).dataType == TimestampType
    def tsNum(c: Column): Column =
      if (isTimestamp) unix_micros(c).cast("double") else c.cast("double")
    // carry the right timestamp inside the payload for tolerance/nearest
    val payload = struct((col(ts).as("_mts") +: rightCols.map(col)): _*)
    val r = right.select(col(key), col(ts), col(tieBreak),
      payload.as("_asof_payload"), lit(0).as("_side"))
    val leftCols = left.columns
    val l = left.withColumn("_asof_payload",
        lit(null).cast(r.schema("_asof_payload").dataType))
      .withColumn("_side", lit(1))
      .select(r.columns.map(col) ++ leftCols.filterNot(
        c => c == key || c == ts || c == tieBreak).map(col): _*)
    val base = l.unionByName(r, allowMissingColumns = true)
    // backward: right sorts before left at equal ts; last → largest tiebreak
    val wB = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left sorts before right at equal ts; first → smallest tiebreak
    val wF = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side").desc, col(tieBreak))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withMatches = direction match {
      case "backward" =>
        base.withColumn("_match",
          last(col("_asof_payload"), ignoreNulls = true).over(wB))
      case "forward" =>
        base.withColumn("_match",
          first(col("_asof_payload"), ignoreNulls = true).over(wF))
      case "nearest" =>
        val b = last(col("_asof_payload"), ignoreNulls = true).over(wB)
        val f = first(col("_asof_payload"), ignoreNulls = true).over(wF)
        base
          .withColumn("_mb", b).withColumn("_mf", f)
          .withColumn("_match",
            when(col("_mb").isNull, col("_mf"))
              .when(col("_mf").isNull, col("_mb"))
              .when(tsNum(col("_mf._mts")) - tsNum(col(ts)) <
                    tsNum(col(ts)) - tsNum(col("_mb._mts")), col("_mf"))
              .otherwise(col("_mb"))) // exact-distance tie → backward
    }
    val matched = withMatches.filter(col("_side") === 1)
    val inTol: Column = tolerance match {
      case None => col("_match").isNotNull
      case Some(tol) => col("_match").isNotNull &&
        abs(tsNum(col("_match._mts")) - tsNum(col(ts))) <= tol
    }
    matched.select(
      leftCols.map(col) ++
        rightCols.map(c =>
          when(inTol, col(s"_match.$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
