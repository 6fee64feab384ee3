package graft.queries

import graft.{Compat, NamedQuery, Tables}
import graft.Compat._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational core (SURVEY.md §2.1–§2.8): scans, projections, filters,
  * the full join family, hash aggregates, windows, rollup/cube, set ops, and
  * the scalar-function battery. Everything here is pure Catalyst built-ins —
  * predicate pushdown, column pruning, partial aggregation, AQE join
  * selection all apply with no custom code.
  *
  * Scale notes are per-query; the general rules: small dimensions are
  * broadcast (region/nation/supplier stay tiny at any SF), fact-fact joins
  * shuffle on their keys once, and aggregates are partial+final so the
  * shuffle carries only group keys.
  */
object Relational {

  /** TPC-H Q1 shape — the workhorse scan+agg. At 100 TB this is a single
    * shuffle of (returnflag, linestatus) partial aggregates: ~6 groups,
    * map-side combine reduces each task's output to a handful of rows. */
  private val q01 = NamedQuery(
    "q01_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))
            * dec2(lit(1) + col("l_tax"))).cast(DoubleType).as("sum_charge"),
          (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(col("l_quantity"))).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** TPC-H Q6 shape — selective scan + single-row aggregate. Predicates all
    * push to the parquet scan; no shuffle beyond the final 1-row combine. */
  private val q02 = NamedQuery(
    "q02_revenue_filter",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(
          col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Row-level projection + conjunctive filter + CASE — the reference's
    * border-mask / peak-threshold predicates (core.py:309-336) transposed.
    * Row-level IEEE arithmetic is bit-identical across engines. */
  private val q03 = NamedQuery(
    "q03_derived_projection",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") > 5 && col("l_quantity") < 45 &&
          col("l_extendedprice") > 1000.0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
          when(col("l_quantity") >= 30, lit("bulk"))
            .when(col("l_quantity") >= 15, lit("mid"))
            .otherwise(lit("small")).as("qty_class"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      l_extendedprice * (1 - l_discount) AS disc_price,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      CASE WHEN l_quantity >= 30 THEN 'bulk' WHEN l_quantity >= 15 THEN 'mid' ELSE 'small' END AS qty_class
      FROM lineitem
      WHERE l_quantity > 5 AND l_quantity < 45 AND l_extendedprice > 1000.0"""))

  /** Multi-way join + agg (TPC-H Q5 shape). nation/region/customer are
    * broadcast (small at any SF once pre-aggregated); the lineitem⋈orders
    * join shuffles on orderkey — the single unavoidable big shuffle. */
  private val q04 = NamedQuery(
    "q04_join_revenue_nation",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT r_name, n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name"""))

  /** Left-semi join (EXISTS). At scale: broadcast the distinct key set when
    * small, else shuffled semi — Catalyst/AQE decide. */
  private val q05 = NamedQuery(
    "q05_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""))

  /** Left-anti join (NOT EXISTS) — the reference's row-removal-by-computed-
    * set pattern (core.py:337,340). */
  private val q06 = NamedQuery(
    "q06_anti_join",
    (s, d) => {
      // customers with no URGENT order: the right side is pre-filtered so
      // the gate carries rows at every SF (the plain no-orders form is
      // empty at sf0.01 in this synthetic data — a vacuous empty≡empty
      // hash; round 14). The filter lands on the scan, the anti-join
      // stays a single custkey-keyed build.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""))

  /** Left outer join + grouped count, preserving customers with no orders. */
  private val q07 = NamedQuery(
    "q07_left_join_count",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spend"))
    },
    Some("""SELECT c_custkey, c_mktsegment,
      COUNT(o_orderkey) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment"""))

  /** Full outer join of two pre-aggregated sides (null-producing on both). */
  private val q08 = NamedQuery(
    "q08_full_outer_nation",
    (s, d) => {
      val cn = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nationkey"), "full_outer")
    },
    Some("""SELECT nationkey, n_cust, n_supp FROM
      (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL JOIN
      (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      USING (nationkey)"""))

  /** Theta join (cross + non-equi predicate) — the shape of the reference's
    * distance-predicate joins (core.py:148-177). Small side broadcast →
    * BroadcastNestedLoopJoin; at scale the banded rewrite in
    * operators.SpatialJoins replaces the raw cross product. */
  private val q09 = NamedQuery(
    "q09_theta_join_balance",
    (s, d) => {
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      c.join(broadcast(sup),
          abs(col("c_acctbal") - col("s_acctbal")) < 5.0 &&
          col("c_nationkey") =!= col("s_nationkey"))
        .select(col("c_custkey"), col("s_suppkey"),
          (col("c_acctbal") - col("s_acctbal")).as("bal_diff"))
    },
    Some("""SELECT c_custkey, s_suppkey, c_acctbal - s_acctbal AS bal_diff
      FROM customer, supplier
      WHERE ABS(c_acctbal - s_acctbal) < 5.0 AND c_nationkey <> s_nationkey"""))

  /** Global top-k (core.py:514's top-30 limit): TakeOrderedAndProject —
    * per-partition top-k then driver merge; no full sort at any scale. */
  private val q10 = NamedQuery(
    "q10_topk_orders",
    (s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** Ranking window family: row_number / rank / dense_rank / percent_rank /
    * ntile, top-3 per group (core.py:338-340's rank-trim shape). */
  private val q11 = NamedQuery(
    "q11_window_rank_topk",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(LongType).as("rn"),
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(3).over(w).cast(LongType).as("tile"))
        .filter(col("rn") <= 3)
    },
    Some("""SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        CAST(RANK() OVER w AS BIGINT) AS rnk,
        CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        PERCENT_RANK() OVER w AS prnk,
        CAST(NTILE(3) OVER w AS BIGINT) AS tile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) t WHERE rn <= 3"""))

  /** Aggregate-over-frame windows: running total (unbounded preceding) and
    * 3-row moving average. Decimal accumulation keeps the frame sums exact
    * and engine-independent (DuckDB's segment-tree frame evaluation would
    * otherwise reorder double additions). */
  private val q12 = NamedQuery(
    "q12_window_frames",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = w.rowsBetween(-2, Window.currentRow)
      o.select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec2(col("o_totalprice"))).over(wRun).cast(DoubleType).as("running_spend"),
          (sum(dec2(col("o_totalprice"))).over(wMov).cast(DoubleType) /
            count(col("o_totalprice")).over(wMov)).as("moving_avg"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_spend,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wm AS DOUBLE) / COUNT(o_totalprice) OVER wm AS moving_avg
      FROM orders
      WINDOW
        wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wm AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""))

  /** Analytic window functions: lag / lead / first / last over a frame. */
  private val q13 = NamedQuery(
    "q13_window_lag_lead",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(wAll).as("first_price"),
          last(col("o_totalprice")).over(wAll).as("last_price"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .cast(LongType).as("days_since_prev"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      LAG(o_totalprice, 1) OVER w AS prev_price,
      LEAD(o_totalprice, 1) OVER w AS next_price,
      FIRST_VALUE(o_totalprice) OVER wa AS first_price,
      LAST_VALUE(o_totalprice) OVER wa AS last_price,
      CAST(DATEDIFF('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
      FROM orders
      WINDOW
        w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** ROLLUP with grouping-flag output. */
  private val q14 = NamedQuery(
    "q14_rollup_pricing",
    (s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_rows"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast(LongType).as("gid"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      COUNT(*) AS n_rows,
      CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  /** CUBE with grouping-flag output. */
  private val q15 = NamedQuery(
    "q15_cube_counts",
    (s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast(LongType).as("gid"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""))

  /** Set operations: UNION / INTERSECT / EXCEPT (distinct semantics) —
    * the epoch-catalog union + computed-row-removal shapes (§2.7). */
  private val q16 = NamedQuery(
    "q16_set_ops",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
      val b = o.filter(col("o_totalprice") > 200000.0).select(col("o_custkey").as("custkey"))
      val cc = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
      a.union(b).distinct().intersect(cc.distinct()).except(
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey")))
    },
    Some("""(SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
       UNION
       SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"""))

  /** Distinct aggregates: exact COUNT(DISTINCT) — the HLL approx variant is
    * a separate rows-only query (q17b) since sketches differ by engine. */
  private val q17 = NamedQuery(
    "q17_distinct_counts",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT l_suppkey,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_suppkey"""))

  /** approx_count_distinct (HLL++). Sketch values are engine-specific, so no
    * SQL oracle (driver records rows-only); exactness is covered by q17. */
  private val q17b = NamedQuery(
    "q17b_approx_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders")),
    None,
    note = Some("HLL++ estimates are engine-specific by design; the " +
      "estimate's accuracy is hash-gated by the q98_hll_rel_error " +
      "certificate and exactness by q17."))

  /** String-function battery, incl. the reference's `name[:22]` set-name
    * truncation (psf_phot.py:48). */
  private val q18 = NamedQuery(
    "q18_string_funcs",
    (s, d) => {
      val p = Tables.part(s, d)
      p.select(
          col("p_partkey"),
          substring(col("p_name"), 1, 22).as("set_name"),
          upper(col("p_brand")).as("brand_uc"),
          lower(col("p_type")).as("type_lc"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_size").cast(StringType)).as("brand_size"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("key_pad"),
          instr(col("p_name"), "a").cast(LongType).as("a_pos"),
          col("p_name").startsWith("a").as("starts_a"),
          col("p_name").contains("ss").as("has_ss"),
          reverse(col("p_brand")).as("brand_rev"))
    },
    Some("""SELECT p_partkey,
      SUBSTRING(p_name, 1, 22) AS set_name,
      UPPER(p_brand) AS brand_uc,
      LOWER(p_type) AS type_lc,
      CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
      REPLACE(p_type, ' ', '_') AS type_us,
      LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      CAST(STRPOS(p_name, 'a') AS BIGINT) AS a_pos,
      p_name LIKE 'a%' AS starts_a,
      p_name LIKE '%ss%' AS has_ss,
      REVERSE(p_brand) AS brand_rev
      FROM part"""))

  /** Date/time battery incl. the reference's ISOT↔JD conversion
    * (p_io.py:48-53): JD = unix_seconds/86400 + 2440587.5. */
  private val q19 = NamedQuery(
    "q19_date_funcs",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.select(
          col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).cast(LongType).as("o_year"),
          month(col("o_orderdate")).cast(LongType).as("o_month"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("o_day"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
            .cast(LongType).as("days_since_95"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"),
          (unix_timestamp(col("o_orderdate")) / lit(86400.0) + lit(2440587.5)).as("jd"))
    },
    Some("""SELECT o_orderkey, o_orderdate,
      CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
      CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
      DATE_TRUNC('month', o_orderdate) AS month_start,
      CAST(DATEDIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
      o_orderdate + INTERVAL 30 DAY AS plus_30d,
      CAST(EPOCH(o_orderdate) AS DOUBLE) / 86400.0 + 2440587.5 AS jd
      FROM orders"""))

  /** Math battery: the reference's scalar expressions (§2.8) — Euclidean
    * distance as sqrt of products (bit-exact; hypot is not cross-engine
    * stable), magnitude −2.5·log10 (p_io.py:111, rounded — transcendental),
    * abs/ceil/floor/mod. */
  private val q20 = NamedQuery(
    "q20_math_funcs",
    (s, d) => {
      val p = Tables.part(s, d)
      val px = col("p_retailprice")
      val sz = col("p_size").cast(DoubleType)
      p.select(
          col("p_partkey"),
          sqrt(px * px + sz * sz).as("dist"),
          r6(lit(-2.5) * log10(px)).as("mag"),
          r6(log(px)).as("ln_price"),
          r6(exp(sz / lit(100.0))).as("exp_size"),
          abs(px - lit(1000.0)).as("abs_diff"),
          ceil(px).as("ceil_price"),
          floor(px).as("floor_price"),
          pmod(col("p_partkey"), lit(7)).as("key_mod7"))
    },
    Some("""SELECT p_partkey,
      SQRT(p_retailprice * p_retailprice + CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS dist,
      ROUND(-2.5 * LOG10(p_retailprice), 6) AS mag,
      ROUND(LN(p_retailprice), 6) AS ln_price,
      ROUND(EXP(CAST(p_size AS DOUBLE) / 100.0), 6) AS exp_size,
      ABS(p_retailprice - 1000.0) AS abs_diff,
      CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
      CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
      p_partkey % 7 AS key_mod7
      FROM part"""))

  /** JSON extraction from the events.props payload (§2.8 JSON surface). */
  private val q21 = NamedQuery(
    "q21_json_extract",
    (s, d) => {
      val e = Tables.events(s, d)
      e.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          (get_json_object(col("props"), "$.k").cast(DoubleType) * col("value")).as("kv"))
    },
    Some("""SELECT event_id,
      CAST(props->>'$.k' AS BIGINT) AS k,
      CAST(props->>'$.k' AS DOUBLE) * value AS kv
      FROM events"""))

  /** Typed JSON parsing (from_json with an explicit schema — the struct
    * path next to q21's string extraction), to_json round-trip, and a
    * schema-validity flag per row. */
  private val q90 = NamedQuery(
    "q90_json_typed",
    (s, d) => {
      val e = Tables.events(s, d)
      val schema = StructType(Seq(StructField("k", LongType)))
      e.filter(col("event_id") % 11 === 0)
        .select(col("event_id"),
          from_json(col("props"), schema).as("p"))
        .select(col("event_id"),
          col("p.k").as("k"),
          col("p").isNotNull.as("parsed"),
          to_json(col("p")).as("rebuilt"))
    },
    Some("""SELECT event_id,
      CAST(props->>'$.k' AS BIGINT) AS k,
      json_valid(props) AS parsed,
      '{"k":' || (props->>'$.k') || '}' AS rebuilt
      FROM events WHERE event_id % 11 = 0"""))

  val all: Seq[NamedQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q17b, q18, q19, q20, q21, q90)
}
