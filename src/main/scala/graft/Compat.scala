package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bit-stability helpers for the DuckDB differential oracle.
  *
  * The driver hash-compares Spark results against DuckDB running equivalent
  * ANSI SQL. Row-level IEEE-754 arithmetic (+,-,*,/ and sqrt) is deterministic
  * and identical across both engines, but:
  *
  *   - SUM over doubles depends on accumulation order (partial aggregation /
  *     different scan order) — so money sums go through exact DECIMAL
  *     arithmetic in BOTH engines and are cast back to double at the end.
  *     The fixtures' money columns are exact 2-decimal values, so the
  *     double→decimal cast is lossless and engine-independent.
  *   - transcendental functions (log, log10, exp, pow, sin, cos) may differ
  *     in the last ulp between libm and the JVM — outputs built from them are
  *     rounded to 6 decimals on both sides ([[r6]]).
  *
  * These helpers mirror the SQL idioms used in `SparkEntry.oracleSql`.
  */
object Compat {
  /** Lossless 2-decimal money cast (fixture money columns are exact). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent exact sum of a 2-decimal money column, as double.
    * SQL mirror: `CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact mean of a money column: decimal sum / count, both double ops.
    * SQL mirror: `CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Round to 6 decimals — for transcendental-function outputs.
    *
    * Magnitude caveat: ROUND(x, 6) is only cross-engine stable when
    * |x|·1e6 stays well below 2^40 or so. DuckDB rounds via x·1e6 whose
    * ulp reaches ~5e-4 at x≈2.4e6, so ~1/2048 of such values quantize to
    * an exact half-integer and round differently from Spark's
    * decimal-string rounding. Round a small-magnitude offset (e.g.
    * jd − 2460000) instead of the raw value. */
  def r6(c: Column): Column = round(c, 6)
}
