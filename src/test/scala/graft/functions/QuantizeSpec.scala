package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: code range, error bound, zero-vector
  * degeneracy, cosine preservation on realistic vectors. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(vecs: Seq[Array[Double]]) = {
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "e")
      .withColumn("scale", quantizeScale(col("e")))
      .withColumn("q", quantizeInt8(col("e"), col("scale")))
      .withColumn("dq", dequantizeInt8(col("q"), col("scale")))
      .select(col("id"), col("e"), col("scale"), col("q"), col("dq"))
      .as[(Long, Seq[Double], Double, Seq[Int], Seq[Double])]
      .collect()
  }

  test("codes stay in [-127,127]; error bounded by scale/2") {
    val rnd = new scala.util.Random(9)
    val rows = roundTrip(Seq.fill(50)(Array.fill(32)(rnd.nextGaussian() * 3)))
    rows.foreach { case (_, e, scale, q, dq) =>
      assert(q.forall(c => c >= -127 && c <= 127))
      // the max-|v| element quantizes to exactly +-127
      assert(q.map(math.abs).max === 127)
      e.zip(dq).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-12)
      }
      // cosine with the original stays high at int8 resolution
      val cos = e.zip(dq).map { case (a, b) => a * b }.sum /
        (math.sqrt(e.map(x => x * x).sum) * math.sqrt(dq.map(x => x * x).sum))
      assert(cos > 0.999, s"cosine degraded to $cos")
    }
  }

  test("zero vectors quantize to zero codes with scale 0") {
    val rows = roundTrip(Seq(Array.fill(8)(0.0)))
    val (_, _, scale, q, dq) = rows.head
    assert(scale === 0.0)
    assert(q.forall(_ === 0) && dq.forall(_ === 0.0))
  }

  test("negative halves round half-up like the oracle's FLOOR(x+0.5)") {
    // scale = 1 exactly when max|v| = 127: -2.5 -> floor(-2.0) = -2
    val rows = roundTrip(Seq(Array(127.0, -2.5, 2.5, -127.0)))
    val (_, _, scale, q, _) = rows.head
    assert(scale === 1.0)
    assert(q === Seq(127, -2, 3, -127))
  }
}
