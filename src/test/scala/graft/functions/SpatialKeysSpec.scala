package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order key properties: bijection on the 16-bit × 16-bit domain, and
  * the point of the exercise — range-partitioning by the key bounds each
  * partition's 2-D extent, which is what lets file/row-group min-max
  * stats prune box predicates at scale. */
class SpatialKeysSpec extends SparkSpec {
  import spark.implicits._

  test("interleave/deinterleave is a bijection on random coordinates") {
    val rnd = new scala.util.Random(4)
    val pts = (0 until 2000)
      .map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
      .withColumn("z", expr(SpatialKeys.zorderSql("x", "y")))
      .withColumn("xb", expr(SpatialKeys.deinterleaveXSql("z")))
      .withColumn("yb", expr(SpatialKeys.deinterleaveYSql("z")))
    assert(pts.filter(col("x") =!= col("xb") || col("y") =!= col("yb"))
      .count() === 0)
    // order preservation at the quadrant level: the top interleaved bits
    // are the coarse quadrant, so keys from distinct quadrants don't mix
    val q = pts.select(
      (col("x") >= 32768).cast("int").as("qx"),
      (col("y") >= 32768).cast("int").as("qy"), col("z"))
      .withColumn("top", expr("(z >> 30) & 3"))
    assert(q.filter(expr("top != qx + 2 * qy")).count() === 0)
  }

  test("zorder layout: a box predicate touches far fewer partitions") {
    // the pruning metric that matters: how many partition bounding boxes
    // (≙ files with min-max stats) intersect a square query box. A
    // one-axis sort makes full-width slabs — a 256² box crosses ~P·s/4096
    // of them — while z-order tiles bound both axes.
    val rnd = new scala.util.Random(9)
    val pts = (0 until 120000)
      .map(_ => (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
      .toDF("x", "y")
      .withColumn("z", expr(SpatialKeys.zorderSql("x", "y")))
    def boxes(sorted: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      sorted.select("x", "y").as[(Long, Long)]
        .mapPartitions { it =>
          val ps = it.toArray
          if (ps.isEmpty) Iterator.empty
          else Iterator.single((ps.map(_._1).min, ps.map(_._1).max,
            ps.map(_._2).min, ps.map(_._2).max))
        }.collect()
    def hits(bs: Array[(Long, Long, Long, Long)]): Int = {
      // average over 9 query boxes of 256x256
      val qs = for (qx <- Seq(512L, 1792L, 3072L); qy <- Seq(512L, 1792L, 3072L))
        yield (qx, qy)
      qs.map { case (qx, qy) =>
        bs.count { case (x0, x1, y0, y1) =>
          x1 >= qx && x0 <= qx + 255 && y1 >= qy && y0 <= qy + 255 }
      }.sum
    }
    val zHits = hits(boxes(pts.repartitionByRange(256, col("z"))))
    val yHits = hits(boxes(pts.repartitionByRange(256, col("y"))))
    assert(zHits * 2 < yHits,
      s"zorder hit $zHits partitions vs y-sort $yHits — no locality win")
  }
}
