package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distance-predicate joins over 2-D point sets, grid-bucketed so they scale.
  *
  * The reference computes an O(n²) cross-distance matrix with per-row argmin
  * (`calculate_shift`, core.py:148-177) and an O(n²) crowding double loop
  * (`image_mask`, core.py:317-330). Both are re-expressed as equi-joins on a
  * spatial grid of cell size = radius: a point's true neighbors within
  * `radius` always lie in its 3×3 cell neighborhood, so probing 9 cells is
  * exact, and the join shuffles by cell key instead of materializing the
  * cross product — at 1000 executors this partitions cleanly by cell.
  * Skewed cells (dense star fields) are handled by AQE skew-join splitting.
  */
object SpatialJoins {

  private def withCell(df: DataFrame, x: String, y: String, radius: Double): DataFrame =
    df.withColumn("_cx", floor(col(x) / radius).cast(LongType))
      .withColumn("_cy", floor(col(y) / radius).cast(LongType))

  /** 3×3 neighborhood expansion: each probe row is duplicated into the 9
    * cells that can contain a neighbor within `radius`. */
  private def withNeighborCells(df: DataFrame, x: String, y: String, radius: Double): DataFrame =
    withCell(df, x, y, radius)
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_cx", col("_cx") + col("_dx"))
      .withColumn("_cy", col("_cy") + col("_dy"))
      .drop("_dx", "_dy")

  /** Nearest-neighbor join (`calculate_shift` semantics, core.py:148-177):
    * for each left point, the single closest right point, kept only when its
    * distance is strictly below `radius` (core.py:171-172 does argmin over
    * all pairs then the radius check — equivalent to argmin over the grid
    * candidates, since a surviving row's global argmin is within radius and
    * therefore among the candidates). Ties broken by right id. Emits
    * (leftId, rightId, dist, dx, dy) with dx = lx − rx (core.py:173-175).
    */
  def nearestNeighbor(
      left: DataFrame, leftId: String, lx: String, ly: String,
      right: DataFrame, rightId: String, rx: String, ry: String,
      radius: Double): DataFrame = {
    val l = withNeighborCells(
      left.select(col(leftId).as("left_id"), col(lx).as("_lx"), col(ly).as("_ly")),
      "_lx", "_ly", radius)
    val r = withCell(
      right.select(col(rightId).as("right_id"), col(rx).as("_rx"), col(ry).as("_ry")),
      "_rx", "_ry", radius)
    val dxe = col("_lx") - col("_rx")
    val dye = col("_ly") - col("_ry")
    val dist = sqrt(dxe * dxe + dye * dye)
    l.join(r, Seq("_cx", "_cy"))
      .withColumn("_dist", dist)
      .filter(col("_dist") < radius)
      .groupBy(col("left_id"))
      .agg(min_by(
        struct(col("right_id"), col("_dist").as("dist"),
          dxe.as("dx"), dye.as("dy")),
        struct(col("_dist"), col("right_id"))).as("nn"))
      .select(col("left_id"), col("nn.right_id").as("right_id"),
        col("nn.dist").as("dist"), col("nn.dx").as("dx"), col("nn.dy").as("dy"))
  }

  /** Crowding exclusion (`image_mask` semantics, core.py:317-330): keep only
    * points with NO other point within `radius` (strict <). Grid-bucketed
    * self-join feeding a left-anti join — a distance-predicate anti-join. */
  def crowdingAnti(points: DataFrame, id: String, x: String, y: String,
      radius: Double): DataFrame = {
    val probe = withNeighborCells(
      points.select(col(id).as("_pid"), col(x).as("_px"), col(y).as("_py")),
      "_px", "_py", radius)
    val base = withCell(
      points.select(col(id).as("_qid"), col(x).as("_qx"), col(y).as("_qy")),
      "_qx", "_qy", radius)
    val dxe = col("_px") - col("_qx")
    val dye = col("_py") - col("_qy")
    val crowded = probe.join(base, Seq("_cx", "_cy"))
      .filter(col("_pid") =!= col("_qid") &&
        sqrt(dxe * dxe + dye * dye) < radius)
      .select(col("_pid")).distinct()
    points.join(crowded, col(id) === col("_pid"), "left_anti")
  }
}
