package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators for the 100 TB write path (SURVEY.md §2.1/§8).
  *
  * A corpus this size is read far more often than it is written, so the
  * write path should buy read-side pruning: Z-ORDER clustering makes one
  * sorted layout serve range predicates on SEVERAL columns at once (file
  * and row-group min/max stats stay tight on every interleaved dimension,
  * so a 2-D box predicate prunes most files before any is opened), and a
  * COMPACTION PLAN turns the small-file problem (streaming sinks +
  * per-cell appends produce many KB-scale files; a 100 TB listing of them
  * overwhelms both the driver and the NameNode-equivalent) into a single
  * distributed query: order the listing, prefix-sum the sizes, cut bins
  * at a target size.
  *
  * Everything here is expression-tree / window work — no UDFs, no
  * collects; the prefix sum is the two-pass range-partitioned form whose
  * only global step is over ONE ROW PER PARTITION.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative dimension columns, y above x. A pure codegen expression
    * tree — `bits` pairs of shift/mask/scale terms summed — so it
    * evaluates inside WholeStageCodegen and is usable directly as a
    * `repartitionByRange`/`sortWithinPartitions` clustering key.
    *
    * Locality property (the point of the interleave): keys close in z are
    * close in BOTH x and y, so every written file covers a small square-ish
    * tile of the (x, y) plane instead of a thin full-height stripe — which
    * is what keeps per-file min/max ranges selective on both columns. */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)),
        shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }
    terms.reduce(_ + _)
  }

  /** The identical interleave as ANSI SQL (DuckDB dialect shares `>>`,
    * `&`, `%`) — generated from the same loop so the oracle can never
    * drift from the Column tree. `x`/`y` are SQL expressions. */
  def zorderKeySql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { b =>
      Seq(
        s"((($x) >> $b) & 1) * ${1L << (2 * b)}",
        s"((($y) >> $b) & 1) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")
  }

  /** Range-partitioned two-pass prefix sum of `valueCol` in `orderCol`
    * order — the scale form of `sum(...) over (order by ... rows
    * unbounded preceding)`, whose naive plan is a SINGLE-PARTITION sort
    * (the classic global-window scale killer).
    *
    * Pass 1: range-partition by the order column and cumsum WITHIN each
    * partition (parallel). Pass 2: a window over one total per partition
    * (numPartitions rows, broadcast back) supplies each partition's start
    * offset. Output adds `cumsum` = inclusive running total. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      numPartitions: Int): DataFrame = {
    val parted = df
      .repartitionByRange(numPartitions, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val local = parted.withColumn("_local_cum",
      sum(col(valueCol)).over(Window.partitionBy(col("_pid"))
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per partition; the exclusive-prefix window here is over a
    // bounded model-sized table, then broadcast back to the data
    val offsets = local.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_ptotal"))
      .withColumn("_offset",
        coalesce(sum(col("_ptotal")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("cumsum", col("_local_cum") + col("_offset"))
      .drop("_pid", "_local_cum")
  }

  /** Compaction plan: greedy first-fit binning of a file listing
    * `(orderCol, sizeCol)` into bins of ~`targetSize` bytes, preserving
    * `orderCol` order (so compacted files stay range-prunable). A file
    * whose exclusive prefix sum has crossed bin boundary k starts or
    * continues bin k: `bin = floor((cumsum - size) / target)` — one
    * prefix sum plus arithmetic, so the whole planner is a distributed
    * query over the listing, never a driver loop. Output: one row per
    * input file with its assigned `bin`. */
  def compactionBins(listing: DataFrame, orderCol: String, sizeCol: String,
      targetSize: Long, numPartitions: Int = 32): DataFrame = {
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    prefixSum(listing, orderCol, sizeCol, numPartitions)
      .withColumn("bin",
        floor((col("cumsum") - col(sizeCol)) / lit(targetSize)).cast("long"))
  }
}
