package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining SURVEY.md §2 surface: grouping sets, multiset (ALL) set ops,
  * map/header-merge semantics (§2.3 header merge, §2.8 map ops), the
  * reference's exotic roundings (§2.8, §7 hard-part 6), WCS-style affine
  * sky transform (core.py:525-526), the full image_mask predicate chain
  * (core.py:309-336), scalar subqueries, and the generalized Lomb-Scargle
  * periodogram with tau correction (walkthrough cells 13-14).
  */
object Extras {

  /** GROUPING SETS — beyond rollup/cube (§2.5 required surface). */
  private val q30 = NamedQuery(
    "q30_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast(LongType).as("gid"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""))

  /** Multiset set operations: INTERSECT ALL / EXCEPT ALL (§2.7). */
  private val q31 = NamedQuery(
    "q31_set_ops_all",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_suppkey") % 2 === 0).select(col("l_linenumber"))
      val b = li.filter(col("l_partkey") % 3 === 0).select(col("l_linenumber"))
      a.intersectAll(b).exceptAll(
        li.filter(col("l_quantity") > 45).select(col("l_linenumber")))
    },
    Some("""SELECT l_linenumber FROM lineitem WHERE l_suppkey % 2 = 0
      INTERSECT ALL
      SELECT l_linenumber FROM lineitem WHERE l_partkey % 3 = 0
      EXCEPT ALL
      SELECT l_linenumber FROM lineitem WHERE l_quantity > 45"""))

  /** Header-map semantics (p_io.py:40-42 + psf_phot.py:94): build header
    * maps, filter HISTORY/COMMENT keys, merge with WCS-side precedence
    * (map_zip_with coalesce — the map-level left-outer merge), keyed lookup.
    * The oracle checks the observable lookups, not map internals. */
  private val q32 = NamedQuery(
    "q32_map_header_merge",
    (s, d) => {
      val p = Tables.part(s, d)
      val hdr = map(
        lit("brand"), col("p_brand"), lit("type"), col("p_type"),
        lit("HISTORY"), lit("junk"), lit("COMMENT"), lit("noise"))
      val wcs = map(lit("type"), upper(col("p_type")),
        lit("size"), col("p_size").cast(StringType))
      val filtered = map_filter(hdr, (k, _) => !k.isin("HISTORY", "COMMENT"))
      val merged = map_zip_with(filtered, wcs, (_, v1, v2) => coalesce(v2, v1))
      p.select(col("p_partkey"),
        element_at(merged, "type").as("h_type"),
        element_at(merged, "brand").as("h_brand"),
        element_at(merged, "size").as("h_size"),
        map_contains_key(merged, "HISTORY").as("has_history"),
        size(map_keys(merged)).cast(LongType).as("n_keys"))
    },
    Some("""SELECT p_partkey, UPPER(p_type) AS h_type, p_brand AS h_brand,
      CAST(p_size AS VARCHAR) AS h_size, FALSE AS has_history,
      CAST(3 AS BIGINT) AS n_keys FROM part"""))

  /** The reference's rounding zoo (§7 hard-part 6): banker's rounding
    * (np.rint, core.py:207-208), round-to-odd fitshape
    * (ceil(f)//2*2+1, core.py:443-444), truncation, half-up rounding. */
  private val q33 = NamedQuery(
    "q33_rounding_zoo",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val x = col("l_quantity") / 2.0 // exact .0/.5 halves
      val f = col("l_quantity") / 3.0
      li.select(col("l_orderkey"), col("l_linenumber"),
        expr("rint(l_quantity / 2.0)").as("banker"),
        expr("CAST(ceil(l_quantity / 3.0) AS BIGINT) div 2 * 2 + 1").as("fitshape_odd"),
        x.cast(LongType).as("truncated"),
        round(f, 0).as("half_up"),
        signum(col("l_quantity") - 25).as("sign"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      CASE WHEN l_quantity / 2.0 = FLOOR(l_quantity / 2.0) + 0.5
           THEN FLOOR(l_quantity / 2.0) + (CAST(FLOOR(l_quantity / 2.0) AS BIGINT) % 2)
           ELSE ROUND(l_quantity / 2.0) END AS banker,
      CAST(CEIL(l_quantity / 3.0) AS BIGINT) // 2 * 2 + 1 AS fitshape_odd,
      CAST(TRUNC(l_quantity / 2.0) AS BIGINT) AS truncated,
      ROUND(l_quantity / 3.0, 0) AS half_up,
      CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sign
      FROM lineitem"""))

  /** Full gnomonic (TAN) deprojection behind the WCS solve
    * (core.py:525-526: `WCS(wcs_header)` implies CD matrix + TAN): the
    * affine CD step of q34 produces intermediate world coords (ξ, η); this
    * inverts the tangent-plane projection to (ra, dec). All trig → r6
    * rounding; radian conversion parenthesized `x * (pi/180)` to keep both
    * engines' grouping identical (Compat rules). */
  private val q85 = NamedQuery(
    "q85_tan_projection",
    (s, d) => {
      val p = Tables.part(s, d)
      val xi = ((col("p_partkey") * 37 % 1000) - 500) / 1.0e6 // radians
      val eta = ((col("p_partkey") * 91 % 1000) - 500) / 1.0e6
      val dec0 = lit(-32.5) * (lit(math.Pi) / 180.0)
      val ra0 = lit(150.125)
      val denom = cos(dec0) - eta * sin(dec0)
      val ra = ra0 + atan2(xi, denom) * (lit(180.0) / math.Pi)
      val dec = atan(
        (sin(dec0) + eta * cos(dec0)) / sqrt(xi * xi + denom * denom)) *
        (lit(180.0) / math.Pi)
      p.select(col("p_partkey"), r6(ra).as("ra"), r6(dec).as("dec"))
    },
    Some("""SELECT p_partkey,
      ROUND(150.125 + atan2(((p_partkey*37%1000) - 500) / 1.0e6,
        cos(-32.5 * (pi() / 180.0)) - ((p_partkey*91%1000) - 500) / 1.0e6 * sin(-32.5 * (pi() / 180.0)))
        * (180.0 / pi()), 6) AS ra,
      ROUND(atan(
        (sin(-32.5 * (pi() / 180.0)) + ((p_partkey*91%1000) - 500) / 1.0e6 * cos(-32.5 * (pi() / 180.0)))
        / sqrt((((p_partkey*37%1000) - 500) / 1.0e6) * (((p_partkey*37%1000) - 500) / 1.0e6)
          + (cos(-32.5 * (pi() / 180.0)) - ((p_partkey*91%1000) - 500) / 1.0e6 * sin(-32.5 * (pi() / 180.0)))
            * (cos(-32.5 * (pi() / 180.0)) - ((p_partkey*91%1000) - 500) / 1.0e6 * sin(-32.5 * (pi() / 180.0)))))
        * (180.0 / pi()), 6) AS dec
      FROM part"""))

  /** Cone search — ens_match's positional form (walkthrough cells 7-8):
    * all catalog rows within an angular radius of the target position,
    * great-circle distance via haversine. Scale shape: the radius
    * predicate pre-filters on a bounding box (pushed to the scan) before
    * any trig runs; trig outputs r6-rounded for the oracle. */
  private val q92 = NamedQuery(
    "q92_cone_search",
    (s, d) => {
      val p = Tables.part(s, d)
      val ra = ((col("p_partkey") * 37 % 3600) / 10.0)
      val dec = (((col("p_partkey") * 91 % 1200) / 10.0) - 60.0)
      val (ra0, dec0, radius) = (150.125, -32.5, 15.0)
      val rad = lit(math.Pi) / 180.0
      val dphi = (dec - lit(dec0)) * rad / 2.0
      val dlam = (ra - lit(ra0)) * rad / 2.0
      val h = sin(dphi) * sin(dphi) +
        cos(dec * rad) * cos(lit(dec0) * rad) * sin(dlam) * sin(dlam)
      val dist = lit(2.0) * asin(sqrt(h)) * (lit(180.0) / math.Pi)
      p.select(col("p_partkey"), ra.as("ra"), dec.as("dec"),
          r6(dist).as("sep_deg"))
        // bounding-box prefilter (scan-pushable), then the exact cone cut
        .filter(abs(col("dec") - dec0) <= radius)
        .filter(col("sep_deg") <= radius)
    },
    Some("""WITH c AS (SELECT p_partkey,
        (p_partkey*37%3600)/10.0 AS ra,
        ((p_partkey*91%1200)/10.0) - 60.0 AS dec
      FROM part)
      SELECT p_partkey, ra, dec,
        ROUND(2.0 * asin(sqrt(
          sin((dec - -32.5) * (pi() / 180.0) / 2.0) * sin((dec - -32.5) * (pi() / 180.0) / 2.0)
          + cos(dec * (pi() / 180.0)) * cos(-32.5 * (pi() / 180.0))
            * sin((ra - 150.125) * (pi() / 180.0) / 2.0) * sin((ra - 150.125) * (pi() / 180.0) / 2.0)))
          * (180.0 / pi()), 6) AS sep_deg
      FROM c
      WHERE abs(dec - -32.5) <= 15.0
        AND ROUND(2.0 * asin(sqrt(
          sin((dec - -32.5) * (pi() / 180.0) / 2.0) * sin((dec - -32.5) * (pi() / 180.0) / 2.0)
          + cos(dec * (pi() / 180.0)) * cos(-32.5 * (pi() / 180.0))
            * sin((ra - 150.125) * (pi() / 180.0) / 2.0) * sin((ra - 150.125) * (pi() / 180.0) / 2.0)))
          * (180.0 / pi()), 6) <= 15.0"""))

  /** WCS-style linear pixel→sky transform (core.py:525-526): affine CD
    * matrix on broadcast solution coefficients — a pure expression tree. */
  private val q34 = NamedQuery(
    "q34_wcs_transform",
    (s, d) => {
      val p = Tables.part(s, d)
      val x = (col("p_partkey") * 37 % 1000) / 10.0
      val y = (col("p_partkey") * 91 % 1000) / 10.0
      val (ra0, dec0, cx, cy) = (150.125, -32.5, 50.0, 50.0)
      val (cd11, cd12, cd21, cd22) = (1.1e-4, 3.0e-6, -2.5e-6, 1.05e-4)
      p.select(col("p_partkey"),
        (lit(ra0) + lit(cd11) * (x - cx) + lit(cd12) * (y - cy)).as("ra"),
        (lit(dec0) + lit(cd21) * (x - cx) + lit(cd22) * (y - cy)).as("dec"))
    },
    Some("""SELECT p_partkey,
      150.125 + 1.1e-4 * ((p_partkey*37%1000)/10.0 - 50.0) + 3.0e-6 * ((p_partkey*91%1000)/10.0 - 50.0) AS ra,
      -32.5 + -2.5e-6 * ((p_partkey*37%1000)/10.0 - 50.0) + 1.05e-4 * ((p_partkey*91%1000)/10.0 - 50.0) AS dec
      FROM part"""))

  /** The full image_mask predicate chain (core.py:309-336): border window,
    * saturation cut, peak above per-group bkg + k·σ (threshold from a
    * windowed aggregate — the scalar-subquery-per-group shape). */
  private val q35 = NamedQuery(
    "q35_image_mask_filters",
    (s, d) => {
      val p = Tables.part(s, d)
      val w = Window.partitionBy(col("p_brand"))
      val x = (col("p_partkey") * 37 % 1000) / 10.0
      val y = (col("p_partkey") * 91 % 1000) / 10.0
      p.select(col("p_partkey"), col("p_brand"),
          x.as("x"), y.as("y"), col("p_retailprice").as("peak"))
        .withColumn("thresh",
          avg(col("peak")).over(w) + lit(0.5) * stddev_pop(col("peak")).over(w))
        .filter(col("x") > 5.0 && col("x") < 95.0 &&
          col("y") > 5.0 && col("y") < 95.0 &&
          col("peak") < 1900.0 && col("peak") > col("thresh"))
        .select(col("p_partkey"), col("p_brand"), col("x"), col("y"), col("peak"),
          r6(col("thresh")).as("thresh"))
    },
    Some("""SELECT p_partkey, p_brand, x, y, peak, ROUND(thresh, 6) AS thresh
      FROM (
        SELECT p_partkey, p_brand,
          (p_partkey*37%1000)/10.0 AS x, (p_partkey*91%1000)/10.0 AS y,
          p_retailprice AS peak,
          AVG(p_retailprice) OVER w + 0.5 * STDDEV_POP(p_retailprice) OVER w AS thresh
        FROM part
        WINDOW w AS (PARTITION BY p_brand)) t
      WHERE x > 5.0 AND x < 95.0 AND y > 5.0 AND y < 95.0
        AND peak < 1900.0 AND peak > thresh"""))

  /** Scalar-subquery filter: orders above the exact global mean price. */
  private val q36 = NamedQuery(
    "q36_scalar_subquery",
    (s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.agg(davg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(stats))
        .filter(col("o_totalprice") > col("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice)
        FROM orders)"""))

  /** Generalized Lomb-Scargle with tau correction and mean-centered flux
    * (walkthrough cells 13-14) — two aggregation passes per frequency:
    * pass 1 computes τ(ω) from Σsin2ωt/Σcos2ωt, pass 2 the projected
    * power. Frequency grid broadcast both times; cost is linear in
    * rows × frequencies. */
  private val q37 = NamedQuery(
    "q37_lomb_scargle_tau",
    (s, d) => {
      val T0_US = 1704067200000000L
      val freqs = s.range(1, 21).select(col("id").as("k"),
        (col("id") * lit(2.0 * math.Pi / 2592000.0)).as("omega"))
      val e = Tables.events(s, d).select(
        ((unix_micros(col("ts")) - lit(T0_US)).cast(DoubleType) / lit(1e6)).as("t"),
        col("value"))
      val ybar = e.agg(avg(col("value")).as("ybar"))
      val ec = e.crossJoin(broadcast(ybar))
        .select(col("t"), (col("value") - col("ybar")).as("yc"))
      val tau = ec.crossJoin(broadcast(freqs))
        .groupBy(col("k"), col("omega"))
        .agg(sum(sin(lit(2.0) * col("omega") * col("t"))).as("s2"),
          sum(cos(lit(2.0) * col("omega") * col("t"))).as("c2"))
        .select(col("k"), col("omega"),
          (atan2(col("s2"), col("c2")) / (lit(2.0) * col("omega"))).as("tau"))
      ec.crossJoin(broadcast(tau))
        .withColumn("arg", col("omega") * (col("t") - col("tau")))
        .groupBy(col("k"))
        .agg(sum(col("yc") * cos(col("arg"))).as("yc_cos"),
          sum(col("yc") * sin(col("arg"))).as("yc_sin"),
          sum(cos(col("arg")) * cos(col("arg"))).as("cc"),
          sum(sin(col("arg")) * sin(col("arg"))).as("ss"))
        .select(col("k"),
          round(lit(0.5) * (col("yc_cos") * col("yc_cos") / col("cc") +
            col("yc_sin") * col("yc_sin") / col("ss")), 4).as("power"))
    },
    Some("""WITH f AS (SELECT k, k * (2 * pi() / 2592000.0) AS omega
               FROM generate_series(1, 20) AS t(k)),
      e AS (SELECT CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 1e6 AS t, value FROM events),
      ec AS (SELECT t, value - (SELECT AVG(value) FROM e) AS yc FROM e),
      tau AS (SELECT k, omega, ATAN2(SUM(SIN(2.0 * omega * t)), SUM(COS(2.0 * omega * t))) / (2.0 * omega) AS tau
              FROM ec CROSS JOIN f GROUP BY k, omega),
      p AS (SELECT tau.k,
              SUM(yc * COS(omega * (t - tau.tau))) AS yc_cos,
              SUM(yc * SIN(omega * (t - tau.tau))) AS yc_sin,
              SUM(COS(omega * (t - tau.tau)) * COS(omega * (t - tau.tau))) AS cc,
              SUM(SIN(omega * (t - tau.tau)) * SIN(omega * (t - tau.tau))) AS ss
            FROM ec CROSS JOIN tau GROUP BY tau.k)
      SELECT k, ROUND(0.5 * (yc_cos * yc_cos / cc + yc_sin * yc_sin / ss), 4) AS power
      FROM p"""))

  /** PIVOT: long→wide restructuring with explicit value columns. */
  private val q38 = NamedQuery(
    "q38_pivot",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
    },
    Some("""PIVOT (SELECT o_orderpriority, o_orderstatus,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s
        FROM orders GROUP BY 1, 2)
      ON o_orderstatus IN ('F', 'O', 'P') USING SUM(s)
      GROUP BY o_orderpriority"""))

  /** UNPIVOT/melt: wide→long restructuring. */
  private val q39 = NamedQuery(
    "q39_unpivot",
    (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast(DoubleType).as("p_size_d"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "metric", "val")
    },
    Some("""SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size_d FROM part)
      UNPIVOT (val FOR metric IN (p_retailprice, p_size_d))"""))

  /** Second string battery: regex extraction/splitting, translate,
    * repeat, null-handling scalars. */
  private val q40b = NamedQuery(
    "q40b_string_funcs2",
    (s, d) => {
      val p = Tables.part(s, d)
      p.select(col("p_partkey"),
        regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_word"),
        substring_index(col("p_type"), " ", 1).as("head_word"),
        substring_index(col("p_type"), " ", -1).as("tail_word"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        repeat(lit("*"), col("p_size") % 5 + 1).as("stars"),
        coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("other")).as("brand_or_other"),
        greatest(col("p_size"), lit(25)).cast(LongType).as("size_floor25"),
        least(col("p_size"), lit(25)).cast(LongType).as("size_cap25"))
    },
    Some("""SELECT p_partkey,
      regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
      split_part(p_type, ' ', 1) AS head_word,
      split_part(p_type, ' ', -1) AS tail_word,
      translate(p_brand, '#', '-') AS brand_dash,
      repeat('*', p_size % 5 + 1) AS stars,
      COALESCE(NULLIF(p_brand, 'Brand#1'), 'other') AS brand_or_other,
      CAST(GREATEST(p_size, 25) AS BIGINT) AS size_floor25,
      CAST(LEAST(p_size, 25) AS BIGINT) AS size_cap25
      FROM part"""))

  /** Array-function battery on the embedding column (§2.8 array ops). */
  private val q41b = NamedQuery(
    "q41b_array_funcs",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("v", transform(col("embedding"), x => x.cast(DoubleType)))
      e.select(col("vec_id"),
        size(col("v")).cast(LongType).as("dim"),
        r6(array_max(col("v"))).as("vmax"),
        r6(array_min(col("v"))).as("vmin"),
        r6(element_at(col("v"), 1)).as("v_first"),
        r6(element_at(col("v"), -1)).as("v_last"),
        r6(element_at(array_sort(col("v")), 32)).as("v_med_lo"),
        size(filter(col("v"), x => x > 0)).cast(LongType).as("n_positive"))
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
      SELECT vec_id,
        CAST(len(v) AS BIGINT) AS dim,
        ROUND(list_max(v), 6) AS vmax,
        ROUND(list_min(v), 6) AS vmin,
        ROUND(v[1], 6) AS v_first,
        ROUND(v[-1], 6) AS v_last,
        ROUND(list_sort(v)[32], 6) AS v_med_lo,
        CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive
      FROM e"""))

  /** Conditional and boolean aggregates: count_if, filtered sums, any/every. */
  private val q42b = NamedQuery(
    "q42b_conditional_aggs",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count_if(col("o_orderstatus") === "F").as("n_finished"),
          sum(when(col("o_orderstatus") === "O", dec2(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType).as("open_value"),
          bool_or(col("o_totalprice") > 400000.0).as("has_jumbo"),
          bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
          max_by(col("o_orderkey"), struct(col("o_totalprice"), negate(col("o_orderkey"))))
            .as("priciest_order"))
    },
    Some("""SELECT o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS open_value,
      bool_or(o_totalprice > 400000.0) AS has_jumbo,
      bool_and(o_totalprice > 1000.0) AS all_over_1k,
      (SELECT t.o_orderkey FROM orders t WHERE t.o_orderpriority = o.o_orderpriority
        ORDER BY t.o_totalprice DESC, t.o_orderkey LIMIT 1) AS priciest_order
      FROM orders o GROUP BY o_orderpriority"""))

  val all: Seq[NamedQuery] = Seq(q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q40b, q41b, q42b, q85, q92)
}
