package graft.queries

import graft.{NamedQuery, Tables}
import graft.Compat._
import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time / light-curve semantics (SURVEY.md §2.9 + the walkthrough's
  * downstream analysis surface): tumbling/sliding/session windows, as-of and
  * range joins, phase folding (cell 12), Lomb-Scargle periodogram (cells
  * 13-14), ensemble normalization (cells 9-10), outlier trimming (cell 10),
  * and the ISOT→JD mid-exposure math (p_io.py:48-53). The `events` fixture
  * is the irregular time series; `value` stands in for flux.
  *
  * Timestamps are handled in integer microseconds (`unix_micros`) wherever a
  * modulo/bucket lands on an exactness boundary, so results are bit-equal
  * across engines.
  */
object TimeSeries {

  /** 2024-01-01T00:00:00Z in microseconds — the fixture epoch origin. */
  private val T0_US = 1704067200000000L

  /** Tumbling event-time window (1 h) — streaming's groupBy(window(...))
    * shape in batch form; epoch-aligned so it matches DuckDB time_bucket. */
  private val q40 = NamedQuery(
    "q40_tumbling_window",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), r6(sum(col("value"))).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"),
          col("sum_value"))
    },
    Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
      COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** Sliding window (1 h window, 30 min slide): each event lands in two
    * windows. */
  private val q41 = NamedQuery(
    "q41_sliding_window",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), r6(sum(col("value"))).as("sum_value"))
        .select(col("w.start").as("wstart"), col("n"), col("sum_value"))
    },
    Some("""WITH x AS (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b, value FROM events),
      w AS (SELECT b AS wstart, value FROM x
            UNION ALL
            SELECT b - INTERVAL 30 MINUTE AS wstart, value FROM x)
      SELECT wstart, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM w GROUP BY wstart"""))

  /** Session window (10 min gap) per user — the burst-of-exposures grouping
    * (README.md:7 "sets of three"). Oracle = classic gaps-and-islands. */
  private val q42 = NamedQuery(
    "q42_session_window",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"), r6(sum(col("value"))).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n"), col("sum_value"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN LAG(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 600000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM e)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 10 MINUTE AS session_end,
        COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
      FROM g GROUP BY user_id, sess"""))

  /** Phase fold (walkthrough cell 12): phase = ((t − t0) mod P)/P with a 6 h
    * period, all in integer µs then one exact double division. */
  private val q43 = NamedQuery(
    "q43_phase_fold",
    (s, d) => {
      val P = 21600000000L // 6 h in µs
      val tUs = unix_micros(col("ts"))
      val phase = ((tUs - lit(T0_US)) % lit(P)).cast(DoubleType) / lit(P.toDouble)
      Tables.events(s, d)
        .select(col("event_id"), phase.as("phase"),
          floor(phase * lit(20.0)).cast(LongType).as("phase_bin"))
    },
    Some(s"""SELECT event_id,
      CAST((epoch_us(ts) - ${T0_US}) % 21600000000 AS DOUBLE) / 21600000000.0 AS phase,
      CAST(FLOOR(CAST((epoch_us(ts) - ${T0_US}) % 21600000000 AS DOUBLE) / 21600000000.0 * 20.0) AS BIGINT) AS phase_bin
      FROM events"""))

  /** Folded light-curve histogram: mean flux per phase bin. */
  private val q44 = NamedQuery(
    "q44_phase_histogram",
    (s, d) => {
      q43.run(s, d)
        .join(Tables.events(s, d), Seq("event_id"))
        .groupBy(col("phase_bin"))
        .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("mean_value"))
    },
    Some(s"""WITH p AS (
        SELECT value,
          CAST(FLOOR(CAST((epoch_us(ts) - ${T0_US}) % 21600000000 AS DOUBLE) / 21600000000.0 * 20.0) AS BIGINT) AS phase_bin
        FROM events)
      SELECT phase_bin, COUNT(*) AS n, ROUND(AVG(value), 6) AS mean_value
      FROM p GROUP BY phase_bin"""))

  /** Lomb-Scargle-style periodogram (walkthrough cells 13-14): frequency
    * grid × irregular series, per-frequency trig aggregates
    * P(ω) = ((Σv·cosωt)² + (Σv·sinωt)²)/n. The grid is broadcast; the
    * aggregation is one shuffle keyed by frequency — scales linearly in
    * rows × frequencies. */
  private val q45 = NamedQuery(
    "q45_lomb_scargle",
    (s, d) => {
      val freqs = s.range(1, 41).select(col("id").as("k"),
        (col("id") * lit(2.0 * math.Pi / 2592000.0)).as("omega"))
      val e = Tables.events(s, d).select(
        ((unix_micros(col("ts")) - lit(T0_US)).cast(DoubleType) / lit(1e6)).as("t_rel"),
        col("value"))
      e.crossJoin(broadcast(freqs))
        .withColumn("angle", col("omega") * col("t_rel"))
        .groupBy(col("k"))
        .agg(
          sum(col("value") * cos(col("angle"))).as("c"),
          sum(col("value") * sin(col("angle"))).as("s"),
          count(lit(1)).as("n"))
        .select(col("k"),
          round((col("c") * col("c") + col("s") * col("s")) / col("n"), 4).as("power"))
    },
    Some(s"""WITH f AS (SELECT k, k * (2 * pi() / 2592000.0) AS omega FROM generate_series(1, 40) AS t(k)),
      e AS (SELECT CAST(epoch_us(ts) - ${T0_US} AS DOUBLE) / 1e6 AS t_rel, value FROM events),
      j AS (SELECT f.k, e.value, f.omega * e.t_rel AS angle FROM e CROSS JOIN f)
      SELECT k, ROUND((SUM(value * COS(angle)) * SUM(value * COS(angle))
        + SUM(value * SIN(angle)) * SUM(value * SIN(angle))) / COUNT(*), 4) AS power
      FROM j GROUP BY k"""))

  /** As-of join: each purchase matched to the user's latest click at or
    * before it — via the join-free union+window implementation. */
  private val q46 = NamedQuery(
    "q46_asof_last_click",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "event_id",
        Seq("ts", "event_id", "value"))
    },
    Some("""SELECT p.event_id, p.user_id, p.ts, p.value,
        c.ts AS asof_ts, c.event_id AS asof_event_id, c.value AS asof_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts
      QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id
        ORDER BY c.ts DESC NULLS LAST, c.event_id DESC) = 1"""))

  /** Range join: events of the same user in the 5 minutes before each error
    * event. Banded on 5-min buckets so it's an equi-join (each probe checks
    * its bucket and the previous one) — no inequality cross product. */
  private val q47 = NamedQuery(
    "q47_range_join_context",
    (s, d) => {
      val BAND = 300000000L // 5 min in µs
      val e = Tables.events(s, d)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          unix_micros(col("ts")).as("err_us"))
        .withColumn("bucket",
          explode(array(floor(col("err_us") / BAND).cast(LongType),
            floor(col("err_us") / BAND).cast(LongType) - 1)))
      val others = e.select(col("event_id").as("ctx_id"),
          col("user_id"), col("event_type").as("ctx_type"),
          unix_micros(col("ts")).as("ctx_us"))
        .withColumn("bucket", floor(col("ctx_us") / BAND).cast(LongType))
      errors.join(others, Seq("user_id", "bucket"))
        .filter(col("ctx_us") < col("err_us") &&
          col("ctx_us") >= col("err_us") - BAND)
        .select(col("err_id"), col("ctx_id"), col("ctx_type"),
          (col("err_us") - col("ctx_us")).as("gap_us"))
    },
    Some("""SELECT e.event_id AS err_id, o.event_id AS ctx_id,
        o.event_type AS ctx_type, epoch_us(e.ts) - epoch_us(o.ts) AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      JOIN events o ON o.user_id = e.user_id
        AND epoch_us(o.ts) < epoch_us(e.ts)
        AND epoch_us(o.ts) >= epoch_us(e.ts) - 300000000"""))

  /** Ensemble normalization (walkthrough cells 9-10, `ens_lc`): target flux
    * relative to the user's comparison ensemble (mean click value) — a
    * conditional window aggregate, no join. */
  private val q48 = NamedQuery(
    "q48_ensemble_normalize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val ens = avg(when(col("event_type") === "click", col("value"))).over(w)
      Tables.events(s, d)
        .withColumn("ens_mean_raw", ens)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"),
          r6(col("ens_mean_raw")).as("ens_mean"),
          r6(col("value") / col("ens_mean_raw")).as("rel_flux"))
    },
    Some("""SELECT event_id, user_id, value,
        ROUND(ens_mean_raw, 6) AS ens_mean,
        ROUND(value / ens_mean_raw, 6) AS rel_flux
      FROM (SELECT *, AVG(CASE WHEN event_type = 'click' THEN value END)
              OVER (PARTITION BY user_id) AS ens_mean_raw
            FROM events) t
      WHERE event_type = 'purchase'"""))

  /** ISOT→JD + mid-exposure time (p_io.py:48-53): JD = unix/86400 +
    * 2440587.5; mid = JD + (exptime/2)/3600/24, `value` as exposure secs. */
  private val q49 = NamedQuery(
    "q49_julian_midexposure",
    (s, d) => {
      val jd = (unix_micros(col("ts")).cast(DoubleType) / lit(1e6)) / lit(86400.0) + lit(2440587.5)
      Tables.events(s, d)
        .select(col("event_id"), jd.as("jd"),
          (jd + col("value") / lit(2.0) / lit(3600.0) / lit(24.0)).as("jd_mid"))
    },
    Some("""SELECT event_id,
      CAST(epoch_us(ts) AS DOUBLE) / 1e6 / 86400.0 + 2440587.5 AS jd,
      CAST(epoch_us(ts) AS DOUBLE) / 1e6 / 86400.0 + 2440587.5 + value / 2.0 / 3600.0 / 24.0 AS jd_mid
      FROM events"""))

  /** Light-curve outlier trim (walkthrough cell 10 step 1): drop epochs
    * outside the exact 5th–95th percentile band. */
  private val q50 = NamedQuery(
    "q50_outlier_trim",
    (s, d) => {
      val e = Tables.events(s, d)
      val bounds = e.agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
      e.crossJoin(broadcast(bounds))
        .filter(col("value") >= col("lo") && col("value") <= col("hi"))
        .select(col("event_id"), col("value"))
    },
    Some("""SELECT event_id, value FROM events
      WHERE value >= (SELECT quantile_cont(value, 0.05) FROM events)
        AND value <= (SELECT quantile_cont(value, 0.95) FROM events)"""))

  /** Barycentric JD correction (p_io.py:55-56) for the canonical target
    * (obj_data.py:18-23): the VSOP87-truncated + giant-planet-SSB model of
    * functions.Barycenter, emitted from ONE coefficient table as both a
    * codegen'd Column tree (no UDF) and the DuckDB oracle SQL;
    * transcendental outputs rounded. */
  private val q51 = NamedQuery(
    "q51_barycentric_jd",
    (s, d) => {
      val cfg = graft.pipeline.ObjConfig.canonical
      val jd = (unix_micros(col("ts")).cast(DoubleType) / lit(1e6)) / lit(86400.0) + lit(2440587.5)
      val corr = graft.functions.Barycenter
        .bjdCorrectionSecondsColumn(col("jd"), cfg.ra, cfg.dec)
      Tables.events(s, d)
        .select(col("event_id"), jd.as("jd"))
        .withColumn("bary_corr_sec", round(corr, 6))
        // round a small-magnitude offset: ROUND at 1e-6 on a ~2.4e6 value
        // is cross-engine unstable (x*1e6 quantizes to ~5e-4 steps)
        .withColumn("bjd_minus_ref",
          round(col("jd") - lit(2460000.0) + corr / lit(86400.0), 6))
    },
    Some(s"""WITH j AS (
        SELECT event_id,
          CAST(epoch_us(ts) AS DOUBLE) / 1e6 / 86400.0 + 2440587.5 AS jd
        FROM events),
      c AS MATERIALIZED (
        SELECT event_id, jd,
          ${graft.functions.Barycenter.bjdCorrectionSecondsSql("jd",
            graft.pipeline.ObjConfig.canonical.ra,
            graft.pipeline.ObjConfig.canonical.dec)} AS corr
        FROM j)
      SELECT event_id, jd,
        ROUND(corr, 6) AS bary_corr_sec,
        ROUND(jd - 2460000.0 + corr / 86400.0, 6) AS bjd_minus_ref
      FROM c"""))

  /** Forward as-of with tolerance: for each purchase, the NEXT click by
    * the same user within 30 minutes (asof_ columns null when the nearest
    * forward match is beyond tolerance). The oracle's QUALIFY mirrors the
    * operator's deterministic tie-break (equal timestamps → smallest id). */
  private val q77 = NamedQuery(
    "q77_asof_forward_tolerance",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
        "event_id", Seq("ts", "event_id"), "forward", Some(1.8e9)) // 30 min µs
    },
    Some("""SELECT p.event_id, p.user_id, p.ts, p.value,
        CASE WHEN c.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(p.ts) <= 1800000000
             THEN c.ts END AS asof_ts,
        CASE WHEN c.ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(p.ts) <= 1800000000
             THEN c.event_id END AS asof_event_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts >= p.ts
      QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id
        ORDER BY c.ts ASC NULLS LAST, c.event_id ASC) = 1"""))

  /** Datetime long tail beyond q19: week truncation, day-of-week (Spark
    * numbers Sunday=1, DuckDB Sunday=0), ISO week, month-end, day diffs,
    * calendar-clamped month addition. */
  private val q89 = NamedQuery(
    "q89_datetime_extras",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        date_trunc("week", col("o_orderdate")).as("week_start"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
        weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
          .cast(LongType).as("days_since"),
        add_months(col("o_orderdate"), 2).as("plus_2m")),
    Some("""SELECT o_orderkey, o_orderdate,
      CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
      CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m
      FROM orders WHERE o_orderkey % 13 = 0"""))

  val all: Seq[NamedQuery] = Seq(q40, q41, q42, q43, q44, q45, q46, q47, q48,
    q49, q50, q51, q77, q89)
}
