package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second relational batch: correlated subqueries (EXISTS / IN / scalar),
  * lateral explode with ordinality, the long tail of window analytics
  * (nth_value, cume_dist, frame-bounded first/last), and the statistical
  * aggregate family (corr/covar/stddev/var/skewness/kurtosis, regr_*).
  *
  * All pure Catalyst built-ins. Scale notes: the subqueries plan as
  * broadcast semi/anti joins against the (small) inner side; the stats
  * aggregates are single-pass co-moment partials merged associatively, so
  * they shuffle one buffer per (partition, group) like any hash aggregate.
  */
object Relational2 {

  /** Correlated EXISTS / NOT EXISTS through the SQL entry point — Spark
    * plans these as semi/anti joins (the DataFrame-side family is q05/q06).
    * Customers with at least one high-value order and no cheap finished
    * order. */
  private val q52 = NamedQuery(
    "q52_exists_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g52_customer")
      Tables.orders(s, d).createOrReplaceTempView("g52_orders")
      s.sql("""SELECT c_custkey, c_name, c_mktsegment FROM g52_customer c
        WHERE EXISTS (SELECT 1 FROM g52_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM g52_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F' AND o.o_totalprice < 50000)""")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F' AND o.o_totalprice < 50000)"""))

  /** IN-subquery plus an uncorrelated scalar subquery. The average goes
    * through exact decimal arithmetic in both engines (Compat rules), so
    * the threshold is bit-identical. */
  private val q53 = NamedQuery(
    "q53_in_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g53_customer")
      Tables.orders(s, d).createOrReplaceTempView("g53_orders")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM g53_orders
        WHERE o_custkey IN (SELECT c_custkey FROM g53_customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                     / COUNT(o_totalprice)
                              FROM g53_orders)""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                   / COUNT(o_totalprice)
                            FROM orders)"""))

  /** Lateral explode with ordinality (meshgrid/ravel generator shape,
    * core.py:81-88): phone segments with their 1-based position. */
  private val q54 = NamedQuery(
    "q54_lateral_ordinality",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        posexplode(split(concat_ws("-", col("c_mktsegment"), col("c_name"),
          col("c_nationkey").cast(StringType)), "-")).as(Seq("pos0", "segment")))
      .select(col("c_custkey"), (col("pos0") + 1).cast(LongType).as("ordinal"),
        col("segment")),
    Some("""SELECT c_custkey,
      CAST(generate_subscripts(string_split(
        c_mktsegment || '-' || c_name || '-' || CAST(c_nationkey AS VARCHAR), '-'), 1) AS BIGINT) AS ordinal,
      UNNEST(string_split(
        c_mktsegment || '-' || c_name || '-' || CAST(c_nationkey AS VARCHAR), '-')) AS segment
      FROM customer"""))

  /** Window-analytic long tail: nth_value, cume_dist, frame-bounded
    * first/last over a deterministic (unique-key) ordering. */
  private val q55 = NamedQuery(
    "q55_window_extras",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val trail = w.rowsBetween(-2, 0)
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"),
          cume_dist().over(w).as("cdist"),
          first(col("o_totalprice")).over(trail).as("trail_first"),
          last(col("o_totalprice")).over(trail).as("trail_last"))
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
      nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price,
      cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS cdist,
      first_value(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail_first,
      last_value(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS trail_last
      FROM orders WHERE o_orderkey % 7 = 0"""))

  /** Statistical aggregate family over integer-valued pairs. Co-moment
    * accumulation order differs between engines → every output is rounded
    * (Compat.r6). Spark reports POPULATION skewness/kurtosis (g1, excess
    * g2); DuckDB reports the sample-adjusted statistics, so the oracle
    * converts: g1 = G1·(n−2)/√(n(n−1)), g2 = (G2·(n−2)(n−3)/(n−1) − 6)/(n+1). */
  private val q56 = NamedQuery(
    "q56_stats_aggs",
    (s, d) => {
      val x = col("l_quantity")
      val y = (col("l_partkey") % 97).cast(DoubleType)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          r6(corr(col("y"), col("x"))).as("r_corr"),
          r6(covar_samp(col("y"), col("x"))).as("r_covs"),
          r6(covar_pop(col("y"), col("x"))).as("r_covp"),
          r6(stddev_samp(col("x"))).as("r_sds"),
          r6(stddev_pop(col("x"))).as("r_sdp"),
          r6(var_samp(col("x"))).as("r_vars"),
          r6(var_pop(col("x"))).as("r_varp"),
          r6(skewness(col("x"))).as("r_skew"),
          r6(kurtosis(col("x"))).as("r_kurt"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      ROUND(corr(y, x), 6) AS r_corr,
      ROUND(covar_samp(y, x), 6) AS r_covs,
      ROUND(covar_pop(y, x), 6) AS r_covp,
      ROUND(stddev_samp(x), 6) AS r_sds,
      ROUND(stddev_pop(x), 6) AS r_sdp,
      ROUND(var_samp(x), 6) AS r_vars,
      ROUND(var_pop(x), 6) AS r_varp,
      ROUND(skewness(x) * (COUNT(*) - 2) / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS r_skew,
      ROUND((kurtosis(x) * (COUNT(*) - 2.0) * (COUNT(*) - 3.0) / (COUNT(*) - 1.0) - 6.0)
            / (COUNT(*) + 1.0), 6) AS r_kurt
      FROM (SELECT l_returnflag, l_quantity AS x,
              CAST(l_partkey % 97 AS DOUBLE) AS y FROM lineitem) t
      GROUP BY l_returnflag"""))

  /** Linear-regression aggregates (the ensemble-normalization /
    * light-curve trend shape, walkthrough cells 9-10). avgx/avgy are exact
    * (integer-valued sums stay under 2^53); slope/intercept/r2 are
    * co-moment ratios → rounded. */
  private val q57 = NamedQuery(
    "q57_regr_aggs",
    (s, d) => {
      val x = col("l_quantity")
      val y = (col("l_suppkey") % 53).cast(DoubleType) + col("l_quantity") * 2.0
      Tables.lineitem(s, d)
        .select(col("l_linestatus"), x.as("x"), y.as("y"))
        .groupBy(col("l_linestatus"))
        .agg(regr_count(col("y"), col("x")).as("n"),
          r6(regr_slope(col("y"), col("x"))).as("slope"),
          r6(regr_intercept(col("y"), col("x"))).as("icept"),
          r6(regr_r2(col("y"), col("x"))).as("r2"),
          regr_avgx(col("y"), col("x")).as("avgx"),
          regr_avgy(col("y"), col("x")).as("avgy"))
    },
    Some("""SELECT l_linestatus, regr_count(y, x) AS n,
      ROUND(regr_slope(y, x), 6) AS slope,
      ROUND(regr_intercept(y, x), 6) AS icept,
      ROUND(regr_r2(y, x), 6) AS r2,
      regr_avgx(y, x) AS avgx,
      regr_avgy(y, x) AS avgy
      FROM (SELECT l_linestatus, l_quantity AS x,
              CAST(l_suppkey % 53 AS DOUBLE) + l_quantity * 2.0 AS y
            FROM lineitem) t
      GROUP BY l_linestatus"""))

  /** Ordered string aggregation (listagg WITHIN GROUP — the catalog-row
    * formatting shape of write_csv's string assembly, p_io.py:117-118). */
  private val q78 = NamedQuery(
    "q78_string_agg",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 997 === 0)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderkey)")
          .as("statuses"),
        concat_ws("|", array_sort(collect_set(col("o_orderstatus"))))
          .as("distinct_statuses"),
        count(lit(1)).as("n")),
    Some("""SELECT o_orderpriority,
      string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses,
      array_to_string(list_sort(list_distinct(list(o_orderstatus))), '|')
        AS distinct_statuses,
      COUNT(*) AS n
      FROM orders WHERE o_orderkey % 997 = 0
      GROUP BY o_orderpriority"""))

  /** Bitwise scalar family + bitwise aggregates (the mask-arithmetic
    * surface behind boolean pixel masks, core.py:309-316). */
  private val q79 = NamedQuery(
    "q79_bitwise",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 31 === 0)
      li.groupBy(col("l_linestatus"))
        .agg(
          expr("bit_and(l_partkey)").as("band"),
          expr("bit_or(l_partkey)").as("bor"),
          expr("bit_xor(l_partkey)").as("bxor"),
          count(lit(1)).as("n"))
        .withColumn("masked", col("band").bitwiseAND(lit(255L)))
        .withColumn("combined", col("bor").bitwiseOR(col("bxor")))
        .withColumn("flipped", col("bxor").bitwiseXOR(lit(0xFFL)))
        .withColumn("shifted", expr("shiftleft(band, 2)"))
    },
    Some("""SELECT l_linestatus,
      bit_and(l_partkey) AS band, bit_or(l_partkey) AS bor,
      bit_xor(l_partkey) AS bxor, COUNT(*) AS n,
      bit_and(l_partkey) & 255 AS masked,
      bit_or(l_partkey) | bit_xor(l_partkey) AS combined,
      xor(bit_xor(l_partkey), 255) AS flipped,
      bit_and(l_partkey) << 2 AS shifted
      FROM lineitem WHERE l_orderkey % 31 = 0
      GROUP BY l_linestatus"""))

  /** Error-safe scalar family: try_divide/try_cast null out instead of
    * raising under ANSI — the NaN-sentinel discipline of SURVEY.md §1
    * mapped to real nulls. */
  private val q80b = NamedQuery(
    "q80b_try_arithmetic",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 101 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_quantity") - 25)
          .as("per_unit_risky"),
        try_divide(lit(1.0), lit(0.0)).as("div_zero"),
        expr("try_cast(l_returnflag AS INT)").as("flag_as_int"),
        expr("try_cast(CAST(l_quantity AS STRING) AS DOUBLE)").as("qty_roundtrip")),
    Some("""SELECT l_orderkey, l_linenumber,
      l_extendedprice / NULLIF(l_quantity - 25, 0) AS per_unit_risky,
      CAST(1.0 AS DOUBLE) / NULLIF(CAST(0.0 AS DOUBLE), 0.0) AS div_zero,
      TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
      TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip
      FROM lineitem WHERE l_orderkey % 101 = 0"""))

  val all: Seq[NamedQuery] = Seq(q52, q53, q54, q55, q56, q57, q78, q79, q80b)
}
