package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (SURVEY.md §2.10 similarity search).
  * Vectors are `array<float>` columns widened elementwise to double (the
  * float→double cast is exact), then folded with builtin higher-order
  * functions — codegen'd, no UDFs. Sequential fold order keeps results
  * within ~1e-14 of any other summation order, far inside the 1e-6 rounding
  * the oracle queries apply.
  */
object VectorFunctions {

  /** Elementwise cast array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
