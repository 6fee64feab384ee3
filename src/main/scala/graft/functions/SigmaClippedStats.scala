package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Result of a sigma-clipped statistics pass: survivors' count, mean,
  * median, population standard deviation, and sum. The sum is the
  * boundary-safe certificate quantity: fixture values are dyadic, so the
  * survivors' sum is EXACTLY representable (every partial sum is a
  * multiple of the same 2^-m granularity) and any engine computes the
  * identical double — whereas the divided mean is inexact and can land
  * within 1 ulp of a 6-decimal rounding boundary, flipping ROUND(·,6)
  * between engines (observed: q25 at sf0.1). */
final case class ClipStats(n: Long, mean: Double, median: Double, std: Double,
    sum: Double)

/** Iterative sigma-clipped statistics — the reference's single most-used
  * primitive (`sigma_clipped_stats`, 5 call sites: core.py:70,141,372,438,
  * psf_phot.py:68). Semantics follow astropy's defaults as used there:
  * center = median, bound = center ± sigma·std_pop (values kept when
  * |v − median| ≤ sigma·std), iterate until fixed point or `maxIters`.
  *
  * Distributivity: clipping is not algebraically mergeable, so the buffer
  * holds the group's values exactly (SURVEY.md §7 hard-part 3). This is by
  * design: every reference call site has small bounded group cardinality
  * (images per pixel ≈ 3, annulus ≈ 1.5 k px, stars per image ≤ thousands).
  * For 100 TB runs the group count is huge (16.7 M pixel keys) but each
  * group stays tiny — exactly the shape Spark hash aggregation scales on,
  * with partial buffers merged by concatenation. Mean/std use Kahan
  * compensated summation so results are reproducible regardless of merge
  * order to well below the 1e-6 output rounding used by the oracle queries.
  */
class SigmaClippedStats(sigma: Double, maxIters: Int)
    extends Aggregator[Double, ArrayBuffer[Double], ClipStats] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2; b1
  }

  override def finish(b: ArrayBuffer[Double]): ClipStats =
    SigmaClippedStats.clip(b.toArray, sigma, maxIters)

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]
  override def outputEncoder: Encoder[ClipStats] = Encoders.product[ClipStats]
}

object SigmaClippedStats {

  /** The iterative clip itself, shared by the Aggregator and the
    * TypedImperativeAggregate fast path so both are bit-identical. */
  def clip(values: Array[Double], sigma: Double, maxIters: Int): ClipStats = {
    if (values.isEmpty)
      return ClipStats(0L, Double.NaN, Double.NaN, Double.NaN, 0.0)
    var vals = values
    var it = 0
    var changed = true
    while (it < maxIters && changed) {
      val med = median(vals)
      val sd = stdPop(vals)
      val kept = vals.filter(v => math.abs(v - med) <= sigma * sd)
      changed = kept.length != vals.length
      if (kept.nonEmpty) vals = kept else changed = false
      it += 1
    }
    ClipStats(vals.length.toLong, mean(vals), median(vals), stdPop(vals),
      kahanSum(vals))
  }

  /** Kahan-compensated sum — merge-order independent to ~2·eps. */
  private[functions] def kahanSum(vals: Array[Double]): Double = {
    var s = 0.0; var c = 0.0
    var i = 0
    while (i < vals.length) {
      val y = vals(i) - c
      val t = s + y
      c = (t - s) - y
      s = t
      i += 1
    }
    s
  }

  def mean(vals: Array[Double]): Double = kahanSum(vals) / vals.length

  /** numpy-style median: average of the two middle order statistics. */
  def median(vals: Array[Double]): Double = {
    val sorted = vals.sorted
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  /** Population standard deviation (ddof=0, numpy default). */
  def stdPop(vals: Array[Double]): Double = {
    val m = mean(vals)
    val sq = vals.map(v => (v - m) * (v - m))
    math.sqrt(kahanSum(sq) / vals.length)
  }

  /** Column function: sigma-clipped stats as a struct(n, mean, median, std).
    * Usage: `df.groupBy(...).agg(sigmaClippedStats(2.0, 3)(col("v")))`.
    * Backed by the TypedImperativeAggregate fast path (primitive buffers,
    * flat serialization) — bit-identical to the Aggregator form, which
    * [[sigmaClippedStatsUdaf]] keeps available as the reference. */
  def sigmaClippedStats(sigma: Double, maxIters: Int): Column => Column =
    (c: Column) => org.apache.spark.sql.GraftExpressionBridge.column(
      org.apache.spark.sql.graftexpr.SigmaClipAggExpr(
        org.apache.spark.sql.GraftExpressionBridge.expression(c),
        sigma, maxIters).toAggregateExpression())

  /** The original Aggregator/udaf form (reference implementation). */
  def sigmaClippedStatsUdaf(sigma: Double, maxIters: Int): Column => Column = {
    val fn = udaf(new SigmaClippedStats(sigma, maxIters), Encoders.scalaDouble)
    (c: Column) => fn(c)
  }
}
