package graft.queries

import graft.{NamedQuery, Tables}
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Data-layout planning queries (SURVEY.md §2.1 write path / §8 scale
  * notes): Z-order clustering keys and small-file compaction planning,
  * both as distributed queries under the full DuckDB hash gate. The
  * physical effects (file-level min/max pruning after a z-ordered write,
  * actual compaction of a keyed sink) are asserted in LayoutSpec; the
  * queries here gate the KEY MATH, which is what must be deterministic
  * and portable for a 100 TB rewrite campaign to be resumable.
  */
object LayoutOps {

  /** q132: Morton (Z-order) clustering keys over (l_partkey, l_suppkey)
    * mod 1024, summarized per 4096-key z-range ("the tile a written file
    * would cover"). The min/max spread per tile IS the read-side story:
    * tight ranges on BOTH dimensions mean a 2-D box predicate prunes at
    * file-listing time. Pure codegen expression tree (Layout.zorderKey);
    * the oracle SQL is generated from the same loop. */
  private val q132 = {
    val bits = 10
    NamedQuery(
      "q132_zorder_layout",
      (s, d) => {
        val x = col("l_partkey") % 1024
        val y = col("l_suppkey") % 1024
        Tables.lineitem(s, d)
          .select(Layout.zorderKey(x, y, bits).as("z"),
            x.as("x"), y.as("y"))
          .groupBy(shiftrightunsigned(col("z"), 12).as("zbucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"),
            sum(col("z")).as("z_sum"))
      },
      Some(s"""
        WITH z AS MATERIALIZED (
          SELECT ${Layout.zorderKeySql("l_partkey % 1024", "l_suppkey % 1024", bits)} AS z,
                 l_partkey % 1024 AS x, l_suppkey % 1024 AS y
          FROM lineitem)
        SELECT z >> 12 AS zbucket, COUNT(*) AS n_rows,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y,
               CAST(SUM(z) AS BIGINT) AS z_sum
        FROM z GROUP BY 1"""))
  }

  /** q134: compaction plan for a small-file listing — the documents table
    * stands in as the listing (doc_id = path order, n_chars = bytes).
    * The greedy first-fit binning is a range-partitioned prefix sum plus
    * arithmetic (Layout.compactionBins — no global sort, no driver
    * loop); the oracle states the same plan as a plain window cumsum,
    * which DuckDB can afford at fixture scale. Summarized per bin so the
    * gate covers every file's bin assignment via n_files/first/last. */
  private val q134 = {
    val target = 20000L
    NamedQuery(
      "q134_compaction_plan",
      (s, d) => Layout.compactionBins(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", target, numPartitions = 8)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_chars")).as("bin_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc")),
      Some(s"""
        WITH c AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 SUM(n_chars) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents)
        SELECT CAST(FLOOR(CAST(cum - n_chars AS DOUBLE) / $target) AS BIGINT) AS bin,
               COUNT(*) AS n_files,
               CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM c GROUP BY 1"""))
  }

  /** q167: HILBERT-curve clustering keys over (l_partkey, l_suppkey) mod
    * 64 (order-6 curve, 4096 cells), summarized per 16-key curve run —
    * q132's gate shape, for the layout that beats Z-order at quadrant
    * seams (consecutive keys are always grid neighbours, so every
    * written file covers one CONNECTED square-ish tile). The Spark side
    * is Layout.withHilbertKey's unrolled per-level projections evaluated
    * per ROW; the oracle restates the same quadrant-digit + rotate
    * recurrence as a RECURSIVE CTE over the distinct cells — an
    * independent executable statement of the algorithm, not a rendering
    * of the Column tree — weighted back by cell row counts. min/max of
    * both dimensions per run IS the pruning story, as in q132. */
  private val q167 = {
    val bits = 6
    NamedQuery(
      "q167_hilbert_layout",
      (s, d) => {
        val rows = Tables.lineitem(s, d).select(
          (col("l_partkey") % 64).as("x"), (col("l_suppkey") % 64).as("y"))
        Layout.withHilbertKey(rows, col("x"), col("y"), bits, "h")
          .groupBy(shiftrightunsigned(col("h"), 4).as("hbucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"),
            sum(col("h")).as("h_sum"))
      },
      Some("""
        WITH RECURSIVE pts AS MATERIALIZED (
          SELECT l_partkey % 64 AS x0, l_suppkey % 64 AS y0,
                 COUNT(*) AS nr
          FROM lineitem GROUP BY 1, 2),
        hil AS (
          SELECT x0, y0, nr, x0 AS x, y0 AS y,
                 CAST(0 AS BIGINT) AS h, CAST(32 AS BIGINT) AS s
          FROM pts
          UNION ALL
          SELECT x0, y0, nr,
            CASE WHEN (y & s) <> 0 THEN x
                 WHEN (x & s) <> 0 THEN 63 - y ELSE y END,
            CASE WHEN (y & s) <> 0 THEN y
                 WHEN (x & s) <> 0 THEN 63 - x ELSE x END,
            h + s * s * xor(3 * (CASE WHEN (x & s) <> 0 THEN 1 ELSE 0 END),
                            CASE WHEN (y & s) <> 0 THEN 1 ELSE 0 END),
            s // 2
          FROM hil WHERE s > 0)
        SELECT CAST(h >> 4 AS BIGINT) AS hbucket,
               CAST(SUM(nr) AS BIGINT) AS n_rows,
               MIN(x0) AS min_x, MAX(x0) AS max_x,
               MIN(y0) AS min_y, MAX(y0) AS max_y,
               CAST(SUM(h * nr) AS BIGINT) AS h_sum
        FROM hil WHERE s = 0 GROUP BY 1"""))
  }

  val all: Seq[NamedQuery] = Seq(q132, q134, q167)
}
