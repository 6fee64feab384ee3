package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import graft.functions.SigmaClippedStats.sigmaClippedStats
import graft.operators.SpatialJoins
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's photometry-pipeline semantics transposed onto the fixture
  * tables (SURVEY.md §2.2, §2.4, §2.5, §2.3): catalog trims, magnitude
  * projection, diagnostics aggregates, sigma-clipped statistics,
  * median-combine over long-form pixels, nearest-neighbor shift matching and
  * crowding exclusion. `lineitem` stands in for the star/pixel tables:
  * flux := l_extendedprice, per-image grouping := l_returnflag / keys.
  */
object PhotometryRel {

  /** Flagship "epoch photometry catalog" (SURVEY.md §7 minimum slice):
    * positive-flux filter + magnitude columns (p_io.py:103-119), two-sided
    * rank trim of the 5 brightest + 5 dimmest when the group has >10 rows
    * (core.py:338-340), flux-desc sort, top-30 per group (core.py:514).
    *
    * BOUNDED-SORT PLAN (round 13): the output only needs post-trim rank
    * ≤ 30, i.e. global per-group row_number ≤ 35, so the rank filter sits
    * DIRECTLY over a single-function window — Catalyst's
    * InferWindowGroupLimit then inserts a Partial WindowGroupLimit before
    * the exchange (each input partition pre-prunes to its local top-35
    * per group; plan-asserted in PlanSpec). The group counts the trim
    * rule needs are a separate tiny aggregate (partial map-side combine →
    * |groups| rows) broadcast-joined back. The previous shape computed
    * cnt as a second window over the same 3-value partition key, which
    * forced the FULL table through three single-task window sorts — a
    * parallelism ceiling at 100× (sweep slope 0.63, the steepest
    * non-quadratic query in the round-12 first decade). */
  private val q22 = NamedQuery(
    "q22_catalog_trim",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val wDesc = Window.partitionBy(col("grp"))
        .orderBy(col("flux").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      val base = li.filter(col("l_extendedprice") > 0)
        .select(col("l_returnflag").as("grp"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("flux"),
          col("l_quantity").as("flux_err"))
      val cnts = base.groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
      // post-trim rank == rnd − 5 when the two-sided trim applied (rows
      // 6..cnt−5 survive in the same order), rnd otherwise — saves the
      // second window shuffle+sort the naive re-rank would cost
      base
        .withColumn("rnd", row_number().over(wDesc))
        .filter(col("rnd") <= 35)
        .join(broadcast(cnts), Seq("grp"))
        .filter(col("cnt") <= 10 || (col("rnd") > 5 && col("rnd") <= col("cnt") - 5))
        .withColumn("rank",
          when(col("cnt") <= 10, col("rnd")).otherwise(col("rnd") - 5)
            .cast(LongType))
        .filter(col("rank") <= 30)
        .select(col("grp"), col("l_orderkey"), col("l_linenumber"), col("flux"),
          r6(lit(-2.5) * log10(col("flux"))).as("mag"),
          r6(lit(1.08574) * col("flux_err") / col("flux")).as("mag_err"),
          col("rank"))
    },
    Some("""WITH base AS (
        SELECT l_returnflag AS grp, l_orderkey, l_linenumber,
               l_extendedprice AS flux, l_quantity AS flux_err,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnd,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        FROM lineitem WHERE l_extendedprice > 0),
      trimmed AS (
        SELECT *, CASE WHEN cnt <= 10 THEN rnd ELSE rnd - 5 END AS rank
        FROM base WHERE cnt <= 10 OR (rnd > 5 AND rnd <= cnt - 5))
      SELECT grp, l_orderkey, l_linenumber, flux,
        ROUND(-2.5 * LOG10(flux), 6) AS mag,
        ROUND(1.08574 * flux_err / flux, 6) AS mag_err,
        CAST(rank AS BIGINT) AS rank
      FROM trimmed WHERE rank <= 30"""))

  /** Diagnostics-sink aggregates (write_txt, p_io.py:139-143): count,
    * min/max/median summaries per group. */
  private val q23 = NamedQuery(
    "q23_diag_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          median(col("l_extendedprice")).as("med_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          median(col("l_quantity")).as("med_qty"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
      MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
      MEDIAN(l_extendedprice) AS med_price,
      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      MEDIAN(l_quantity) AS med_qty
      FROM lineitem GROUP BY l_returnflag"""))

  /** Per-group argmax with deterministic tie-break — the brightest-star
    * selection (core.py:72-76) as `max_by` over a lexicographic struct. */
  private val q24 = NamedQuery(
    "q24_brightest_per_supplier",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(max_by(
          struct(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice").as("peak")),
          struct(col("l_extendedprice"), negate(col("l_orderkey")),
            negate(col("l_linenumber")))).as("b"))
        .select(col("l_suppkey"), col("b.l_orderkey").as("l_orderkey"),
          col("b.l_linenumber").as("l_linenumber"), col("b.peak").as("peak"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, peak FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice AS peak,
        ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem) t WHERE rn = 1"""))

  /** Unrolled sigma-clip SQL: 3 fixed clip iterations with median center and
    * population std — matches the Aggregator's converge-or-maxiters loop
    * because a converged set is a fixed point of further clip passes. */
  private def clipSql(src: String, grp: String, value: String): String =
    s"""WITH v0 AS (SELECT $grp AS g, $value AS x FROM $src),
      s0 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v0 GROUP BY g),
      v1 AS (SELECT v0.g, v0.x FROM v0 JOIN s0 USING (g) WHERE ABS(x - med) <= 2.0 * sd),
      s1 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v1 GROUP BY g),
      v2 AS (SELECT v1.g, v1.x FROM v1 JOIN s1 USING (g) WHERE ABS(x - med) <= 2.0 * sd),
      s2 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v2 GROUP BY g),
      v3 AS (SELECT v2.g, v2.x FROM v2 JOIN s2 USING (g) WHERE ABS(x - med) <= 2.0 * sd)
      SELECT g, COUNT(*) AS n,
        ROUND(CAST(SUM(x) AS DOUBLE), 6) AS sum_clipped,
        MEDIAN(x) AS median, ROUND(STDDEV_POP(x), 6) AS std
      FROM v3 GROUP BY g"""

  /** sigma_clipped_stats per group (core.py:70,141,372,438; sigma=2.0) via
    * the custom Aggregator — background-estimation semantics. */
  private val q25 = NamedQuery(
    "q25_sigma_clipped_stats",
    (s, d) => {
      val scs = sigmaClippedStats(2.0, 3)
      Tables.lineitem(s, d)
        .select(col("l_suppkey").as("g"), col("l_extendedprice").as("x"))
        .groupBy(col("g"))
        .agg(scs(col("x")).as("s"))
        // certificate carries the clipped SUM, not the divided mean: the
        // dyadic fixture makes the survivors' sum exactly representable
        // (identical in any engine, any order), while mean = sum/n can sit
        // within 1 ulp of a 6-decimal rounding boundary and flip ROUND
        // between engines — observed once at sf0.1 (see ClipStats scaladoc)
        .select(col("g"), col("s.n").as("n"),
          r6(col("s.sum")).as("sum_clipped"),
          col("s.median").as("median"), r6(col("s.std")).as("std"))
    },
    Some(clipSql("lineitem", "l_suppkey", "l_extendedprice")))

  /** median_combiner (core.py:215-243) + roll_image key rewrite
    * (core.py:209) on long-form pixels: pixels derived from lineitem as
    * (img=l_linenumber, y, x, v), circular-shifted by (3,5), then per-pixel
    * sigma-clipped median across the stack. At 4096² × N images this is a
    * hash aggregate over 16.7 M keys — Spark's bread and butter; the roll is
    * a pure projection, not a data movement. */
  private val q26 = NamedQuery(
    "q26_pixel_median_combine",
    (s, d) => {
      val scs = sigmaClippedStats(2.0, 3)
      Tables.lineitem(s, d)
        .select(
          ((col("l_orderkey") % 32 + 3) % 32).as("y"),
          ((col("l_partkey") % 32 + 5) % 32).as("x"),
          col("l_quantity").as("v"))
        .groupBy(col("y"), col("x"))
        .agg(scs(col("v")).as("s"))
        .select(col("y"), col("x"), col("s.n").as("n"),
          col("s.median").as("combined"), r6(col("s.std")).as("std"))
    },
    Some("""WITH px AS (SELECT (l_orderkey % 32 + 3) % 32 AS y, (l_partkey % 32 + 5) % 32 AS x, l_quantity AS v FROM lineitem),
      v0 AS (SELECT y*32 + x AS g, v AS x FROM px),
      s0 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v0 GROUP BY g),
      v1 AS (SELECT v0.g, v0.x FROM v0 JOIN s0 USING (g) WHERE ABS(x - med) <= 2.0 * sd),
      s1 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v1 GROUP BY g),
      v2 AS (SELECT v1.g, v1.x FROM v1 JOIN s1 USING (g) WHERE ABS(x - med) <= 2.0 * sd),
      s2 AS (SELECT g, MEDIAN(x) AS med, STDDEV_POP(x) AS sd FROM v2 GROUP BY g),
      v3 AS (SELECT v2.g, v2.x FROM v2 JOIN s2 USING (g) WHERE ABS(x - med) <= 2.0 * sd)
      SELECT g // 32 AS y, g % 32 AS x, COUNT(*) AS n,
        MEDIAN(x) AS combined, ROUND(STDDEV_POP(x), 6) AS std
      FROM v3 GROUP BY g"""))

  /** Deterministic synthetic point sets for the spatial joins: coordinates
    * from exact integer arithmetic so both engines see identical doubles.
    *
    * BOTH sets AREA-SCALE with the catalog (the q29 rule, extended to the
    * two-set join in round 13): each 1000-key block occupies its own
    * 100-unit x-strip, so point density — and the per-point candidate
    * count of the radius-20 NN search — is scale-invariant. The old
    * part-vs-supplier derivation kept every point on ONE 100×100 plate,
    * so a 10× catalog densified it 10× and the NN workload itself grew
    * quadratically (measured slope 3.8 on the sf1 → sf10 decade — a
    * fixture-shape artifact, not an operator property: real surveys grow
    * sky area, they don't densify one plate). Both sets now derive from
    * `part` (stars vs the 1-in-20 reference catalog of calculate_shift),
    * sharing one key space so the strip term tiles them consistently at
    * every SF and under GenScale's constant per-copy key shifts. */
  private def starPointsSql =
    """SELECT p_partkey AS id,
      (p_partkey*37%1000)/10.0 + FLOOR(p_partkey/1000.0)*100.0 AS x,
      (p_partkey*91%1000)/10.0 AS y FROM part"""
  private def refPointsSql =
    """SELECT p_partkey AS id,
      (p_partkey*53%1000)/10.0 + FLOOR(p_partkey/1000.0)*100.0 AS x,
      (p_partkey*17%1000)/10.0 AS y FROM part WHERE p_partkey % 20 = 0"""

  private def starPoints(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.part(s, d).select(col("p_partkey").as("id"),
      ((col("p_partkey") * 37 % 1000) / 10.0 +
        floor(col("p_partkey") / lit(1000.0)) * lit(100.0)).as("x"),
      ((col("p_partkey") * 91 % 1000) / 10.0).as("y"))
  private def refPoints(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.part(s, d).filter(col("p_partkey") % 20 === 0)
      .select(col("p_partkey").as("id"),
        ((col("p_partkey") * 53 % 1000) / 10.0 +
          floor(col("p_partkey") / lit(1000.0)) * lit(100.0)).as("x"),
        ((col("p_partkey") * 17 % 1000) / 10.0).as("y"))

  /** calculate_shift (core.py:148-177): nearest-neighbor join with
    * radius-20 cut, via the grid-bucketed exact NN join. */
  private val q27 = NamedQuery(
    "q27_nn_shift_match",
    (s, d) => SpatialJoins.nearestNeighbor(
      starPoints(s, d), "id", "x", "y", refPoints(s, d), "id", "x", "y", 20.0),
    Some(s"""WITH a AS ($starPointsSql), b AS ($refPointsSql),
      j AS (SELECT a.id AS left_id, b.id AS right_id,
              SQRT((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)) AS dist,
              a.x - b.x AS dx, a.y - b.y AS dy,
              ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY SQRT((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)), b.id) AS rn
            FROM a CROSS JOIN b)
      SELECT left_id, right_id, dist, dx, dy FROM j WHERE rn = 1 AND dist < 20.0"""))

  /** roll_image's robust consensus shift (core.py:203-206): median of the
    * matched-pair offsets. */
  private val q28 = NamedQuery(
    "q28_median_shift",
    (s, d) => {
      q27.run(s, d).agg(
        median(col("dist")).as("med_dist"),
        median(col("dx")).as("med_dx"),
        median(col("dy")).as("med_dy"),
        count(lit(1)).as("n_matched"))
    },
    Some(s"""WITH a AS ($starPointsSql), b AS ($refPointsSql),
      j AS (SELECT a.id AS left_id, b.id AS right_id,
              SQRT((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)) AS dist,
              a.x - b.x AS dx, a.y - b.y AS dy,
              ROW_NUMBER() OVER (PARTITION BY a.id ORDER BY SQRT((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)), b.id) AS rn
            FROM a CROSS JOIN b),
      m AS (SELECT * FROM j WHERE rn = 1 AND dist < 20.0)
      SELECT MEDIAN(dist) AS med_dist, MEDIAN(dx) AS med_dx,
        MEDIAN(dy) AS med_dy, COUNT(*) AS n_matched FROM m"""))

  /** image_mask crowding exclusion (core.py:317-330): keep stars with no
    * neighbor within the radius — distance-predicate anti-join.
    *
    * The synthetic field AREA-SCALES with the catalog: each 1000-key
    * block of part keys gets its own 100-unit x-strip (real surveys grow
    * sky area with catalog size, they don't densify one plate), so star
    * density — and the per-star neighbor count — is scale-invariant and
    * the pair workload grows linearly, at sf0.01 and at a 10× GenScale
    * tiling alike.
    *
    * The field carries TWO strata so the gate is two-sided (round 14 —
    * the all-dense round-13 fixture left zero survivors at every SF,
    * making the hash a vacuous empty≡empty): every 100th key is planted
    * on a sparse shelf at y=150 with 10-unit x spacing (> radius, and
    * ≥50 units above the dense cloud, including across strip seams), so
    * the survivor set is exactly scale-proportional and nonzero — a
    * missed-neighbor bug adds dense rows, a spurious-neighbor bug drops
    * shelf rows, and either moves the hash. */
  private val q29 = NamedQuery(
    "q29_crowding_anti",
    (s, d) => {
      val k = col("p_partkey")
      val sparse = k % 100 === 0
      val pts = Tables.part(s, d).select(k.as("id"),
        (when(sparse, (k % 1000) / 10.0)
          .otherwise((k * 37 % 1000) / 10.0) +
          floor(k / lit(1000.0)) * lit(100.0)).as("x"),
        when(sparse, lit(150.0)).otherwise((k * 91 % 1000) / 10.0).as("y"))
      SpatialJoins.crowdingAnti(pts, "id", "x", "y", 4.0)
    },
    Some(s"""WITH a AS (SELECT p_partkey AS id,
        CASE WHEN p_partkey % 100 = 0 THEN (p_partkey % 1000)/10.0
             ELSE (p_partkey*37 % 1000)/10.0 END
          + FLOOR(p_partkey/1000.0)*100.0 AS x,
        CASE WHEN p_partkey % 100 = 0 THEN 150.0
             ELSE (p_partkey*91 % 1000)/10.0 END AS y FROM part)
      SELECT id, x, y FROM a p WHERE NOT EXISTS (
        SELECT 1 FROM a q WHERE q.id <> p.id
          AND SQRT((p.x-q.x)*(p.x-q.x)+(p.y-q.y)*(p.y-q.y)) < 4.0)"""))

  /** zscale/sqrt-stretch display normalization (p_io.py:68): per-group
    * percentile contrast bounds + clipped sqrt stretch — exact percentile
    * interpolation and IEEE arithmetic are bit-identical cross-engine, so
    * even this "display-only" op verifies.
    *
    * The bounds are a grouped AGGREGATE broadcast-joined back, not a
    * window over the 3-value group key (round 13, the q22 lesson): an
    * unbounded-frame percentile window would drag the whole table
    * through |groups| single-task sorts, while the aggregate shuffles
    * only (group, value) pairs into |groups| percentile buffers and the
    * stretch stays a scan-parallel projection. */
  private val q84 = NamedQuery(
    "q84_zscale_stretch",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val bounds = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.02)").as("lo"),
          expr("percentile(l_extendedprice, 0.98)").as("hi"))
      val unit = (col("l_extendedprice") - col("lo")) / (col("hi") - col("lo"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("lo"), col("hi"),
          sqrt(least(greatest(unit, lit(0.0)), lit(1.0))).as("stretched"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, lo, hi,
        SQRT(LEAST(GREATEST((l_extendedprice - lo) / (hi - lo), 0.0), 1.0)) AS stretched
      FROM (
        SELECT *, quantile_cont(l_extendedprice, 0.02) OVER w AS lo,
          quantile_cont(l_extendedprice, 0.98) OVER w AS hi
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag)) t"""))

  /** Color analysis (walkthrough cells 0+9: 3 filter bands per target):
    * per star, the magnitude difference between two filter catalogs —
    * pivot on the filter label, mag each side from exact decimal flux
    * sums, subtract. The color index is the astronomer's temperature
    * proxy; relationally it's a grouped two-way pivot + derived column. */
  private val q86 = NamedQuery(
    "q86_color_index",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val byFilter = li.groupBy(col("l_suppkey"))
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(sum(dec2(col("l_extendedprice"))).cast(DoubleType))
      byFilter
        .filter(col("O").isNotNull && col("F").isNotNull)
        .select(col("l_suppkey"),
          r6(lit(-2.5) * log10(col("O"))).as("mag_o"),
          r6(lit(-2.5) * log10(col("F"))).as("mag_f"),
          r6(lit(-2.5) * (log10(col("O")) - log10(col("F")))).as("color_of"))
    },
    Some("""WITH f AS (
        SELECT l_suppkey,
          CAST(SUM(CASE WHEN l_linestatus = 'O'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS flux_o,
          CAST(SUM(CASE WHEN l_linestatus = 'F'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS flux_f
        FROM lineitem GROUP BY l_suppkey)
      SELECT l_suppkey,
        ROUND(-2.5 * LOG10(flux_o), 6) AS mag_o,
        ROUND(-2.5 * LOG10(flux_f), 6) AS mag_f,
        ROUND(-2.5 * (LOG10(flux_o) - LOG10(flux_f)), 6) AS color_of
      FROM f WHERE flux_o IS NOT NULL AND flux_f IS NOT NULL"""))

  val all: Seq[NamedQuery] = Seq(q22, q23, q24, q25, q26, q27, q28, q29, q84, q86)
}
