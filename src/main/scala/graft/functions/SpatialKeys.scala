package graft.functions

/** Z-order (Morton) spatial keys: interleave two 16-bit coordinates into
  * one 32-bit locality-preserving key. Sorting/range-partitioning a
  * spatial table by this key bounds each partition's extent on BOTH axes
  * at once, which is what makes file/row-group min-max statistics prune
  * 2-D box predicates — the write-side clustering step for pixel and
  * catalog tables at 100 TB (a sort by (y, x) bounds only one axis).
  *
  * Implemented as a generated shift/mask SQL expression string: pure
  * integer arithmetic, identical in Spark (`expr`) and DuckDB, fully
  * inside whole-stage codegen — no UDF.
  */
object SpatialKeys {

  /** SQL for interleaving `x`/`y` expressions (16 bits each). */
  def zorderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((($x) >> $b) & 1) << ${2 * b}) | (((($y) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")

  /** SQL recovering the x (even-bit) lane from a z-order key. */
  def deinterleaveXSql(z: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((($z) >> ${2 * b}) & 1) << $b)"
    }.mkString("(", " | ", ")")

  /** SQL recovering the y (odd-bit) lane from a z-order key. */
  def deinterleaveYSql(z: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((($z) >> ${2 * b + 1}) & 1) << $b)"
    }.mkString("(", " | ", ")")
}
