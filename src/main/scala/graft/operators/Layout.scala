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

  /** Hilbert-curve key: the position of grid cell (x, y) along the
    * order-`bits` Hilbert space-filling curve (a 2^bits × 2^bits grid).
    * Strictly better clustering than [[zorderKey]] for read-side pruning:
    * consecutive keys are always GRID NEIGHBOURS (Manhattan distance 1 —
    * the curve never teleports the way Z-order does at quadrant seams),
    * so a file covering a key range covers one connected, square-ish
    * region and its per-file min/max stays tight on both dimensions even
    * across quadrant boundaries.
    *
    * The classic iterative index construction (quadrant digit + rotate,
    * e.g. Hamilton, "Compact Hilbert Indices", 2008) is inherently
    * sequential in the bit levels — each level rewrites (x, y) — so it is
    * unrolled as `bits` chained projections via `withColumns`, one per
    * level, all plain when/bitwise expression trees. Catalyst keeps the
    * levels as named intermediates (multi-referenced non-cheap
    * expressions are not inlined by CollapseProject) and whole-stage
    * codegen fuses the chain into one pass, so the key evaluates
    * scan-parallel with no shuffle and no UDF.
    *
    * Adds `out` (LongType) to `df`; `x`/`y` must be non-negative and
    * < 2^bits (callers mod/clamp first, as with [[zorderKey]]). */
  def withHilbertKey(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val n = 1L << bits
    val hx = s"__${out}_hx"; val hy = s"__${out}_hy"
    var cur = df.withColumns(Map(
      hx -> x.cast("long"), hy -> y.cast("long"), out -> lit(0L)))
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = when(col(hx).bitwiseAND(lit(s)) =!= 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col(hy).bitwiseAND(lit(s)) =!= 0, lit(1L)).otherwise(lit(0L))
      // quadrant digit in the rotated frame, then reflect+swap the frame
      cur = cur.withColumns(Map(
        out -> (col(out) + lit(s) * lit(s) * (lit(3L) * rx).bitwiseXOR(ry)),
        hx -> when(ry === 1, col(hx))
          .when(rx === 1, lit(n - 1) - col(hy)).otherwise(col(hy)),
        hy -> when(ry === 1, col(hy))
          .when(rx === 1, lit(n - 1) - col(hx)).otherwise(col(hx))))
      s >>= 1
    }
    cur.drop(hx, hy)
  }

  /** Scalar reference for [[withHilbertKey]] (tests + driver-side plan
    * audits): same algorithm, plain Long arithmetic. */
  def hilbertIndex(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n, s"($x0,$y0) outside 2^$bits grid")
    var x = x0; var y = y0; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
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

  /** Contiguous global row ids 0..n−1 in `order`-column order — the
    * "assign every training example a stable dense sample id" step a
    * corpus needs before epoch replay, curriculum schedules, or
    * checkpoint-resumable data loaders, where `monotonically_increasing_id`
    * leaves per-partition gaps and `row_number() OVER (ORDER BY …)` plans
    * a SINGLE-PARTITION sort (the global-window scale killer).
    *
    * Scale shape: [[rangeSorted]] establishes the total order (Spark's
    * own sampled range exchange — the ONE sort-shuffle a 100 TB corpus
    * can afford, parallel per-partition sorts), then `RDD.zipWithIndex`
    * assigns the dense ids: a count job over the partitions first, then
    * the indexed pass — the exchange WRITE is reused (nothing re-shuffles)
    * but the per-partition sort stage runs twice over the shuffle read;
    * each partition's start offset is baked into its partition METADATA.
    * The DataFrame→RDD→DataFrame round-trip also severs the Catalyst
    * plan at this boundary (no codegen fusion or pushdown across it) —
    * the price of offsets that live per-partition rather than per-task.
    *
    * Why not the two SQL-level alternatives:
    *  - `row_number() OVER (PARTITION BY spark_partition_id())` plans a
    *    SECOND full-data hash exchange to cluster by the pid;
    *  - joining offsets keyed on `TaskContext` / `spark_partition_id()`
    *    is WRONG under plan-shape changes: a downstream `coalesce(1)`
    *    (the Verify dump does exactly this) or an AQE stage merge runs
    *    many range partitions inside one task, so the runtime pid no
    *    longer names the range bucket while the separately-evaluated
    *    offsets side still does — ids silently scramble. zipWithIndex is
    *    immune: offsets live per-partition, not per-task, and the range
    *    boundaries are sampled exactly once on the materialized shuffle.
    *
    * The order columns must form a total order (callers append a unique
    * id as tiebreak) so ids are deterministic under any partition-
    * boundary placement. Adds `out` (LongType, non-null). */
  def contiguousIds(df: DataFrame, order: Seq[Column], numPartitions: Int,
      out: String = "sample_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    require(!df.columns.contains(out),
      s"contiguousIds output column '$out' already exists in the input " +
        s"(columns: ${df.columns.mkString(", ")}) — pass a distinct name")
    val sorted = rangeSorted(df, order, numPartitions)
    val indexed = sorted.rdd.zipWithIndex
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add(out, LongType, nullable = false))
  }

  /** The order-establishing stage of [[contiguousIds]]: a sampled range
    * exchange into `numPartitions` ascending key ranges + parallel
    * within-partition sorts — global total order with no single-
    * partition stage anywhere (PlanSpec-fenced via q178). */
  def rangeSorted(df: DataFrame, order: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(order.nonEmpty, "rangeSorted needs at least one order column")
    df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
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
