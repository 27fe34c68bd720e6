package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.operators.{GridInterpolate, OrderedOps}

/** Battery-shaped generic operators phrased over the `events` table
  * (user_id ≙ cycle_index, ts ≙ timestamp, value ≙ signal — FIXTURES.md F5),
  * each with a DuckDB oracle.
  *
  * Precision contract: `events.ts` is nanosecond parquet. Spark reads it as a
  * ns long (GraftSession); DuckDB 1.x truncates it to a µs TIMESTAMP at scan
  * time. All time math here therefore uses µs (`ts div 1000` ≡ `epoch_us(ts)`)
  * so both engines compute on identical doubles.
  */
object EventOps {

  private val ord = Seq(col("ts"), col("event_id"))
  private val tsUs = expr("ts div 1000")
  /** µs → fractional hours; 3.6e9 µs per hour (oracle: epoch_us(ts)/3600e6). */
  private val tHours = tsUs / lit(3600e6)

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("a1_last_nonnull",
      (s, dir) => OrderedOps.lastNonNull(ev(s, dir), Seq("user_id"), "value",
        ord, "last_value").orderBy("user_id"),
      Some("""SELECT user_id, value AS last_value FROM (
        SELECT user_id, value, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        FROM events WHERE value IS NOT NULL) t
        WHERE rn = 1 ORDER BY user_id""")),

    QueryDef("a2_ratio_guarded",
      (s, dir) => {
        val d = ev(s, dir).groupBy("user_id").agg(
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,6)"))).as("p"),
          sum(when(col("event_type") === "view",
            col("value").cast("decimal(18,6)"))).as("v"))
        d.select(col("user_id"),
            graft.functions.Carriers.micros(col("p")).as("purchase_total_micros"),
            graft.functions.Carriers.micros(col("v")).as("view_total_micros"),
            when(col("v").isNull || col("v") === 0, lit(null).cast(DoubleType))
              .otherwise(round(col("p").cast(DoubleType) / col("v").cast(DoubleType), 6))
              .as("ratio"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id,
        ${graft.functions.Carriers.microsSql("p")} AS purchase_total_micros,
        ${graft.functions.Carriers.microsSql("v")} AS view_total_micros,
        CASE WHEN v IS NULL OR v = 0 THEN NULL
             ELSE round(CAST(p AS DOUBLE) / CAST(v AS DOUBLE), 6) END AS ratio
        FROM (SELECT user_id,
          sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS p,
          sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'view') AS v
          FROM events GROUP BY user_id) t ORDER BY user_id""")),

    QueryDef("a3_norm_by_first",
      (s, dir) => OrderedOps.normalizedByFirst(ev(s, dir), Seq("user_id"),
          "value", ord, "v_norm")
        .select("event_id", "user_id", "v_norm").orderBy("event_id"),
      Some("""SELECT event_id, user_id,
        value / first_value(value) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS v_norm
        FROM events ORDER BY event_id""")),

    QueryDef("a4_trapezoid",
      (s, dir) => OrderedOps.trapezoid(ev(s, dir), Seq("user_id"), "value",
        tHours, ord, "e_trapz").orderBy("user_id"),
      Some("""WITH o AS (SELECT user_id, value,
          epoch_us(ts)/3600e6 AS th,
          lag(value) OVER w AS pv, lag(epoch_us(ts)/3600e6) OVER w AS pt
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id,
          CASE WHEN count(*) < 2 OR count(*) FILTER (WHERE value IS NULL) > 0
               THEN NULL
               ELSE round(abs(sum((value + pv) / 2 * (th - pt))), 4)
          END AS e_trapz
        FROM o GROUP BY user_id ORDER BY user_id""")),

    QueryDef("a5_nearest_row_delta",
      (s, dir) => OrderedOps.nearestRowDelta(ev(s, dir), Seq("user_id"),
        "value", ord, target = 50.0).orderBy("user_id"),
      Some("""WITH r AS (SELECT user_id, value, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) rn FROM events),
        t AS (SELECT user_id, rn AS tidx FROM (
          SELECT user_id, rn, row_number() OVER (
            PARTITION BY user_id ORDER BY abs(value - 50.0), rn) k
          FROM r WHERE value IS NOT NULL) s WHERE k = 1),
        j AS (SELECT r.user_id, r.value, r.rn, t.tidx
              FROM r JOIN t ON r.user_id = t.user_id)
        SELECT user_id,
          median(value) FILTER (WHERE rn BETWEEN tidx-1 AND tidx-1) AS pre_med,
          median(value) FILTER (WHERE rn BETWEEN tidx AND tidx+1) AS post_med,
          median(value) FILTER (WHERE rn BETWEEN tidx AND tidx+1)
            - median(value) FILTER (WHERE rn BETWEEN tidx-1 AND tidx-1) AS delta
        FROM j GROUP BY user_id ORDER BY user_id""")),

    QueryDef("a6_grid_peak",
      // grid-interpolated derivative peak of cumulative value vs time — the
      // dQ/dV kernel shape (semantic tests in GridInterpolateSpec /
      // BatterySpec). The oracle replays the NumPy kernel with DuckDB list
      // lambdas; output is rounded to 4 dp on both sides, which absorbs the
      // np.arange accumulation-vs-multiplication ulp drift (the grid point is
      // v0 + k·24h either way at 4 dp).
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(ord: _*)
        ev(s, dir)
          .withColumn("th", tHours)
          .withColumn("cum", sum("value").over(w))
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("th"), col("cum")))).as("pairs"))
          .withColumn("peak_th", GridInterpolate.peakUdf(lit(24.0),
            expr("transform(pairs, x -> x.th)"), expr("transform(pairs, x -> x.cum)")))
          .select(col("user_id"), round(col("peak_th"), 4).as("peak_th"))
          .orderBy("user_id")
      },
      Some("""WITH o AS (
        SELECT user_id, epoch_us(ts)/3600e6 AS th,
          sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM events),
      g AS (
        SELECT user_id, list(th ORDER BY th ASC, cum ASC NULLS FIRST) AS vs,
               list(cum ORDER BY th ASC, cum ASC NULLS FIRST) AS qs,
               count(*) AS n
        FROM o GROUP BY user_id),
      p AS (
        SELECT user_id, vs, qs,
          CASE WHEN n >= 3 AND vs[-1] - vs[1] >= 24.0
               THEN CAST(ceil((vs[-1] - vs[1]) / 24.0) AS BIGINT) END AS m
        FROM g),
      idx AS (
        SELECT user_id, vs, qs, m, i, vs[1] + 24.0 * i AS x
        FROM p, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i) t
        WHERE m IS NOT NULL AND m >= 2),
      q AS (
        SELECT user_id, m, i, x,
          CASE WHEN len(list_filter(vs, v -> v <= x)) = 0 THEN qs[1]
               WHEN len(list_filter(vs, v -> v <= x)) >= len(vs) THEN qs[-1]
               ELSE qs[len(list_filter(vs, v -> v <= x))]
                  + (qs[len(list_filter(vs, v -> v <= x)) + 1] - qs[len(list_filter(vs, v -> v <= x))])
                  / (vs[len(list_filter(vs, v -> v <= x)) + 1] - vs[len(list_filter(vs, v -> v <= x))])
                  * (x - vs[len(list_filter(vs, v -> v <= x))]) END AS qg
        FROM idx),
      d AS (
        SELECT user_id, i, x,
          CASE WHEN i = 0 THEN (lead(qg) OVER w - qg) / 24.0
               WHEN i = m - 1 THEN (qg - lag(qg) OVER w) / 24.0
               ELSE (lead(qg) OVER w - lag(qg) OVER w) / 48.0 END AS grad
        FROM q WINDOW w AS (PARTITION BY user_id ORDER BY i)),
      pk AS (
        SELECT user_id, x, row_number() OVER (PARTITION BY user_id
            ORDER BY isnan(grad) DESC, CASE WHEN isnan(grad) THEN i END ASC,
                     grad DESC, i ASC) AS rn
        FROM d)
      SELECT g.user_id, round(pk.x, 4) AS peak_th
      FROM g LEFT JOIN (SELECT user_id, x FROM pk WHERE rn = 1) pk USING (user_id)
      ORDER BY user_id""")),

    QueryDef("a7_delta_from_first_valid",
      (s, dir) => OrderedOps.deltaFromFirstValid(ev(s, dir), Seq("user_id"),
          "value", ord, "delta_from_ref")
        .select("event_id", "user_id", "delta_from_ref").orderBy("event_id"),
      Some("""SELECT event_id, user_id,
        CASE WHEN value IS NOT NULL THEN value - first_value(value IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id) END AS delta_from_ref
        FROM events ORDER BY event_id""")),

    QueryDef("a8_ols_fit",
      (s, dir) => OrderedOps.olsFit(ev(s, dir), Seq("user_id"),
        col("value"), tHours, crossAt = 150.0).orderBy("user_id"),
      Some("""SELECT user_id,
        round(regr_slope(value, epoch_us(ts)/3600e6), 4) AS slope,
        round(regr_intercept(value, epoch_us(ts)/3600e6), 4) AS intercept,
        CASE WHEN count(*) < 2 OR regr_slope(value, epoch_us(ts)/3600e6) IS NULL
                  OR regr_slope(value, epoch_us(ts)/3600e6) = 0 THEN NULL
             ELSE round((150.0 - regr_intercept(value, epoch_us(ts)/3600e6))
                        / regr_slope(value, epoch_us(ts)/3600e6), 4)
        END AS cross_x
        FROM events GROUP BY user_id ORDER BY user_id""")),

    QueryDef("a9_stats",
      (s, dir) => ev(s, dir).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("n_users"),
          min("value").as("v_min"),
          max("value").as("v_max"),
          round(sum(col("value").cast("decimal(18,6)")).cast(DoubleType) /
            count(lit(1)), 6).as("v_avg"),
          round(median(col("value")), 6).as("v_median"),
          round(expr("percentile(value, 0.9)"), 6).as("v_p90"))
        .orderBy("event_type"),
      // exact percentile (not approx): duckdb quantile_cont interpolates with
      // the same lower + (upper-lower)*frac formula
      Some("""SELECT event_type, count(*) AS n,
        count(DISTINCT user_id) AS n_users,
        min(value) AS v_min, max(value) AS v_max,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS v_avg,
        round(median(value), 6) AS v_median,
        round(quantile_cont(value, 0.9), 6) AS v_p90
        FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("a10_first_last",
      (s, dir) => ev(s, dir).groupBy("user_id").agg(
          min_by(col("value"), struct(ord: _*)).as("first_value"),
          max_by(col("value"), struct(ord: _*)).as("last_value"))
        .withColumn("trend", col("last_value") - col("first_value"))
        .orderBy("user_id"),
      Some("""WITH r AS (SELECT user_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rf,
          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rl
        FROM events)
        SELECT user_id,
          max(value) FILTER (WHERE rf = 1) AS first_value,
          max(value) FILTER (WHERE rl = 1) AS last_value,
          max(value) FILTER (WHERE rl = 1) - max(value) FILTER (WHERE rf = 1) AS trend
        FROM r GROUP BY user_id ORDER BY user_id""")),

    // A9's scale path: sketch-based distinct counting. exact
    // count_distinct shuffles every distinct key; the HLL sketch carries a
    // fixed-size register array through map-side partial aggregation and
    // merges order-insensitively, so the estimate is deterministic for a
    // given dataset at any partitioning. DuckDB has no DataSketches-
    // compatible HLL → rows-only driver check; ApproxSpec pins the
    // estimate's relative error and partitioning-invariance instead.
    QueryDef("a11_approx_distinct",
      (s, dir) => ev(s, dir).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
            .as("approx_users"),
          count_distinct(col("user_id")).as("exact_users"))
        .orderBy("event_type"),
      None),

    // A11 companion: the deterministic columns of the sketch query, plus an
    // accuracy GATE the driver can hash-check — the oracle asserts the HLL
    // estimate lands within 5% of the exact count (constant 1); Spark
    // computes the bound honestly, so a drifting sketch flips the flag to 0
    // and fails the row. (ApproxSpec additionally pins relative error and
    // partitioning-invariance.)
    QueryDef("a11_distinct_portable",
      (s, dir) => {
        val est = expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
        val exact = count_distinct(col("user_id"))
        ev(s, dir).groupBy("event_type").agg(
            count(lit(1)).as("n"),
            exact.as("exact_users"),
            (abs(est - exact.cast("double")) <= exact.cast("double") * 0.05)
              .cast("long").as("hll_within_5pct"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
        count(DISTINCT user_id) AS exact_users,
        CAST(1 AS BIGINT) AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // A9's other scale path: sketch-based QUANTILES. Exact percentile holds
    // every value per group in memory; approx_percentile carries a
    // fixed-size Greenwald-Khanna summary through map-side partial
    // aggregation with a guaranteed rank error (≤ 1/accuracy = 0.1% here).
    // Gate pattern as a11_distinct_portable: the deterministic columns are
    // exact percentiles the oracle replays; the sketch's estimate is checked
    // against a rank-error band far looser than its guarantee (exact p88 ≤
    // approx p90 ≤ exact p92), emitted as a flag the oracle asserts is 1 —
    // a drifting sketch flips the flag and fails the driver hash.
    QueryDef("a12_quantile_portable",
      (s, dir) => {
        val ap = expr("approx_percentile(value, 0.9, 1000)")
        ev(s, dir).groupBy("event_type").agg(
            count(lit(1)).as("n"),
            round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
            round(expr("percentile(value, 0.9)"), 6).as("p90_exact"),
            (ap >= expr("percentile(value, 0.88)") &&
              ap <= expr("percentile(value, 0.92)"))
              .cast("long").as("approx_in_rank_band"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
        round(quantile_cont(value, 0.5), 6) AS p50_exact,
        round(quantile_cont(value, 0.9), 6) AS p90_exact,
        CAST(1 AS BIGINT) AS approx_in_rank_band
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // A15: gap fill / densification — join a generated calendar spine onto
    // sparse daily counts so missing days materialize as explicit zeros (the
    // step every time-series rollup needs before charting or diffing). The
    // spine explodes from a broadcast 1-row min/max bound; the daily table
    // partial-aggregates map-side; the fill join is keyed on the tiny day
    // table. Day boundary math is ns-exact on the Spark side and immune to
    // DuckDB's µs truncation (sub-µs truncation cannot cross a whole-µs day
    // boundary); explicit FLOOR division because Spark's `div` truncates
    // toward zero while DuckDB's `//` floors — pre-1970 timestamps would
    // land in different days otherwise.
    QueryDef("a15_gap_fill",
      (s, dir) => {
        val n = 86400000000000L
        val daily = ev(s, dir)
          .select(expr(
            s"(ts div $n) - (CASE WHEN ts % $n < 0 THEN 1 ELSE 0 END)")
            .as("day"))
          .groupBy("day").agg(count(lit(1)).as("n"))
        val spine = daily.agg(min("day").as("d0"), max("day").as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        spine.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
            count(*) AS n FROM events GROUP BY 1),
        b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        spine AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b)
        SELECT day, COALESCE(n, 0) AS n
        FROM spine LEFT JOIN daily USING (day) ORDER BY day""")),

    // A16: robust outlier gate — median/MAD z-score per group (the
    // data-cleaning twin of a13's skew profiler: mean/stddev fences break on
    // the very outliers they hunt; the median absolute deviation doesn't).
    // Sequential-pass shape: median → MAD → gate, each a partial-agged
    // percentile that collapses to |groups| rows and BROADCASTS back — the
    // big table never reshuffles. Spark shares no subtrees, so the plan
    // scans the (columnar, 2-column) input three times; at 100 TB that is
    // the honest cost of exact MAD, and the three scans stay embarrassingly
    // parallel while the joins stay broadcast.
    // 1.4826·MAD ≈ σ for normal data (the standard consistency constant);
    // both engines share the exact-percentile interpolation formula (a9,
    // driver-proven) and the boundary compare is the same double math on
    // both sides.
    QueryDef("a16_mad_outliers",
      (s, dir) => {
        val e = ev(s, dir).select("event_type", "value")
        val med = e.groupBy("event_type").agg(median(col("value")).as("med"))
        val dev = e.join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(median(col("adev")).as("mad"), first(col("med")).as("med"))
        dev.drop("med").join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum((col("adev") > lit(3.0) * lit(1.4826) * col("mad"))
              .cast("long")).as("n_outliers"),
            round(first("med"), 6).as("med"),
            round(first("mad"), 6).as("mad"))
          .orderBy("event_type")
      },
      Some("""WITH m AS (SELECT event_type, median(value) AS med
          FROM events GROUP BY 1),
        d AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
          FROM events e JOIN m USING (event_type)),
        s AS (SELECT event_type, median(adev) AS mad, any_value(med) AS med
          FROM d GROUP BY 1)
        SELECT d.event_type, count(*) AS n,
          CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * s.mad
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          round(any_value(s.med), 6) AS med,
          round(any_value(s.mad), 6) AS mad
        FROM d JOIN s USING (event_type)
        GROUP BY d.event_type ORDER BY d.event_type""")),

    // O2x: explicit NULL ORDERING — Spark sorts ASC NULLS FIRST by default,
    // DuckDB (and the SQL standard's usual reading) NULLS LAST: any ranked
    // query over a nullable column silently diverges between engines unless
    // the null position is SPELLED. This row pins asc_nulls_last on both
    // sides (3 cheapest non-null values per user, nulls pushed past them).
    QueryDef("o2_null_ordering",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("value").asc_nulls_last, col("event_id"))
        ev(s, dir)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("user_id"), col("rk"), col("event_id"), col("value"))
          .orderBy("user_id", "rk")
      },
      Some("""SELECT user_id, rk, event_id, value FROM (
          SELECT user_id, event_id, value, row_number() OVER (
            PARTITION BY user_id
            ORDER BY value ASC NULLS LAST, event_id) AS rk
          FROM events) t
        WHERE rk <= 3 ORDER BY user_id, rk""")),

    // A26: time-decay EWMA smoothing per user series — the recency
    // weighting a freshness-aware pipeline applies before thresholding
    // (decay 0.9/step over the last 8 observations). Exactness recipe: the
    // eight weights are PRECOMPUTED integer literals (round(0.9^j·1e6) —
    // both engines consume the same constants, so no cross-libm pow() ever
    // runs), values ride the millis quantization, numerator/denominator
    // are exact integer sums over the available lags (series heads use
    // fewer terms, the denominator adapts), and only the final 1-per-row
    // division touches doubles. ONE window shuffle on user_id; all eight
    // lags share the frame, so Spark plans a single Window operator.
    QueryDef("a26_ewma",
      (s, dir) => {
        val K = 8
        val wts = (0 until K).map(j => math.round(math.pow(0.9, j) * 1e6))
        val w = Window.partitionBy("user_id").orderBy(tsUs, col("event_id"))
        val xm = round(col("value") * 1000, 0).cast("long")
        val lags = (0 until K).map(j =>
          if (j == 0) xm else lag(xm, j).over(w))
        // millis × up-to-1e6 weight: widen BEFORE the multiply (a17's
        // recipe) — plain long arithmetic wraps silently for |value| ≳
        // 9.2e9 while DuckDB BIGINT errors, so the engines would diverge;
        // the DECIMAL(38,0) carrier mirrors the oracle's HUGEINT exactly
        val num = lags.zip(wts).map { case (l, wt) =>
          coalesce(l.cast("decimal(38,0)") * wt,
            lit(0L).cast("decimal(38,0)")) }.reduce(_ + _)
        val den = lags.zip(wts).map { case (l, wt) =>
          when(l.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
        ev(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), col("event_id"),
            round(num.cast(DoubleType) / den.cast(DoubleType) / 1000.0, 6)
              .as("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some {
        val wts = (0 until 8).map(j => math.round(math.pow(0.9, j) * 1e6))
        val lagCols = (1 until 8).map(j =>
          s"lag(xm, $j) OVER (PARTITION BY user_id ORDER BY t, event_id) AS x$j")
          .mkString(", ")
        val num = (s"${wts(0)} * CAST(xm AS HUGEINT)" +: (1 until 8).map(j =>
          s"coalesce(${wts(j)} * CAST(x$j AS HUGEINT), 0)")).mkString(" + ")
        val den = (s"${wts(0)}" +: (1 until 8).map(j =>
          s"CASE WHEN x$j IS NOT NULL THEN ${wts(j)} ELSE 0 END")).mkString(" + ")
        s"""WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t,
              CAST(round(value * 1000) AS BIGINT) AS xm
            FROM events WHERE value IS NOT NULL),
          l AS (SELECT user_id, event_id, xm, $lagCols FROM p)
          SELECT user_id, event_id,
            round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE) / 1000.0, 6)
              AS ewma
          FROM l ORDER BY user_id, event_id"""
      }),

    // A17: lag-1 autocorrelation per user series — the signal-smoothness
    // profile (is `value` a random walk or i.i.d. noise?). Exactness recipe:
    // values are quantized to integer MILLIS first, the five correlation
    // sums (Σx Σy Σxy Σx² Σy²) ride exact DECIMAL(38,0) carriers (a long
    // x·y product wraps silently for |value| ≳ 3e6 — the operand is widened
    // BEFORE the multiply; DuckDB mirrors with HUGEINT), and only the final
    // 1-row-per-user Pearson formula touches doubles — on identical inputs
    // in both engines. One key shuffle (the lag window); the agg rides the
    // window's partitioning.
    QueryDef("a17_lag_autocorr",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(tsUs, col("event_id"))
        val q = round(col("value") * 1000, 0).cast("long")
        val pairs = ev(s, dir)
          .select(col("user_id"), q.as("y"), lag(q, 1).over(w).as("x"))
          .filter(col("x").isNotNull && col("y").isNotNull)
        val n = col("n_pairs")
        val num = (n * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
        val den = sqrt((n * col("sxx") - col("sx") * col("sx")).cast(DoubleType)) *
          sqrt((n * col("syy") - col("sy") * col("sy")).cast(DoubleType))
        val dx = col("x").cast("decimal(38,0)")
        val dy = col("y").cast("decimal(38,0)")
        pairs.groupBy("user_id").agg(
            count(lit(1)).as("n_pairs"),
            sum(dx).as("sx"), sum(dy).as("sy"),
            sum(dx * col("y")).as("sxy"),
            sum(dx * col("x")).as("sxx"),
            sum(dy * col("y")).as("syy"))
          .select(col("user_id"), col("n_pairs"),
            round(when(den === 0.0, lit(null)).otherwise(num / den), 6)
              .as("autocorr"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (SELECT user_id,
            CAST(round(value * 1000) AS BIGINT) AS y,
            lag(CAST(round(value * 1000) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS x
          FROM events),
        sums AS (SELECT user_id, count(*) AS n_pairs,
            CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM p WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_pairs,
          round(CASE WHEN sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)) = 0.0 THEN NULL
            ELSE CAST(n_pairs * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) END, 6)
            AS autocorr
        FROM sums ORDER BY user_id""")),

    // A18: one-pass column profile — per-column null count + exact distinct
    // cardinality, the data-quality report run before trusting a new feed.
    // One aggregate over the scan (Spark plans the multi-distinct via a
    // single Expand pass), then stack() pivots the 1-row result into one
    // row per column. At 100 TB the exact count_distinct swaps for the
    // a11-style HLL sketch; the shape is otherwise identical.
    QueryDef("a18_profile",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val cols = o.columns.toSeq
        val aggs = cols.flatMap(c => Seq(
          sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
          count_distinct(col(c)).as(s"${c}__distinct")))
        val stacked = cols.map(c => s"'$c', ${c}__nulls, ${c}__distinct")
          .mkString(", ")
        o.agg(aggs.head, aggs.tail: _*)
          .select(expr(s"stack(${cols.length}, $stacked)")
            .as(Seq("col_name", "n_nulls", "n_distinct")))
          .orderBy("col_name")
      },
      Some("""SELECT col_name, n_nulls, n_distinct FROM (
          SELECT 'o_orderkey' AS col_name,
            count(*) - count(o_orderkey) AS n_nulls,
            count(DISTINCT o_orderkey) AS n_distinct FROM orders
          UNION ALL SELECT 'o_custkey', count(*) - count(o_custkey),
            count(DISTINCT o_custkey) FROM orders
          UNION ALL SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
            count(DISTINCT o_orderstatus) FROM orders
          UNION ALL SELECT 'o_totalprice', count(*) - count(o_totalprice),
            count(DISTINCT o_totalprice) FROM orders
          UNION ALL SELECT 'o_orderdate', count(*) - count(o_orderdate),
            count(DISTINCT o_orderdate) FROM orders
          UNION ALL SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
            count(DISTINCT o_orderpriority) FROM orders) t
        ORDER BY col_name""")),

    // A25: Welch's t statistic between two snapshots per group — the
    // classical two-sample drift test beside a21's PSI (PSI sees shape
    // drift, t sees mean drift with unequal variances). The five sums ride
    // exact integer/decimal carriers (squares of millis values would
    // overflow a long at scale); the statistic and its Welch–Satterthwaite
    // dof come out of one 5-number-per-side formula in deterministic
    // double math.
    QueryDef("a25_welch_t",
      (s, dir) => {
        val e = ev(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            (col("event_id") % 2).as("side"),
            round(col("value") * 1000, 0).cast("long").as("xm"))
        val agg = e.groupBy("event_type", "side")
          .agg(count(lit(1)).as("n"), sum("xm").as("sx"),
            // cast ONE operand before the multiply: a long*long product wraps
            // silently for |xm| > ~3.03e9; decimal(38,0)*long widens first
            sum(col("xm").cast("decimal(38,0)") * col("xm")).as("sxx"))
        def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
        val mean = d(col("sx")) / d(col("n"))
        val varc = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))) /
          (d(col("n")) - 1.0)
        val sides = agg.select(col("event_type"), col("side"),
          col("n"), mean.as("m"), varc.as("v"))
        val a = sides.filter(col("side") === 0)
          .select(col("event_type"), col("n").as("na"), col("m").as("ma"),
            col("v").as("va"))
        val b = sides.filter(col("side") === 1)
          .select(col("event_type"), col("n").as("nb"), col("m").as("mb"),
            col("v").as("vb"))
        val se2 = col("va") / col("na") + col("vb") / col("nb")
        a.join(b, "event_type")
          .select(col("event_type"), col("na"), col("nb"),
            round((col("ma") - col("mb")) / sqrt(se2), 6).as("t_stat"),
            round(se2 * se2 /
              (col("va") * col("va") / (col("na") * col("na") * (col("na") - 1.0))
                + col("vb") * col("vb") / (col("nb") * col("nb") * (col("nb") - 1.0))),
              6).as("dof"))
          .orderBy("event_type")
      },
      Some("""WITH s AS (SELECT event_type, event_id % 2 AS side,
            CAST(round(value * 1000) AS BIGINT) AS xm
          FROM events WHERE value IS NOT NULL),
        g AS (SELECT event_type, side, count(*) AS n,
            CAST(sum(xm) AS BIGINT) AS sx,
            sum(CAST(xm AS HUGEINT) * xm) AS sxx
          FROM s GROUP BY 1, 2),
        m AS (SELECT event_type, side, n,
            CAST(sx AS DOUBLE) / n AS m,
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / n) / (n - 1.0) AS v
          FROM g)
        SELECT a.event_type, a.n AS na, b.n AS nb,
          round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
          round((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
            (a.v * a.v / (a.n * CAST(a.n AS DOUBLE) * (a.n - 1.0))
              + b.v * b.v / (b.n * CAST(b.n AS DOUBLE) * (b.n - 1.0))), 6)
            AS dof
        FROM m a JOIN m b ON a.event_type = b.event_type
          AND a.side = 0 AND b.side = 1
        ORDER BY a.event_type""")),

    // A24: Gini concentration — how unequally mass is distributed across a
    // group's values (source-contribution concentration is the data-mixing
    // diagnostic this feeds). Exactness: values quantized to integer
    // micros, ranks from a unique (value, id) order, Σx and Σi·x carried
    // EXACTLY (the rank-weighted sum rides a DECIMAL(38,0) carrier —
    // a long Σi·x overflows ~2e19 at the 10× fixture), and only the final
    // per-group formula touches doubles, identically in both engines.
    QueryDef("a24_gini",
      (s, dir) => {
        // Σi·x folded over distinct values, NOT ranked rows: the rank-
        // weighted sum is invariant to tie order (equal x commute), so for
        // a distinct value with count c and m strictly-smaller rows the
        // ranks are m+1..m+c and Σi·x contributes x·(c·m + c(c+1)/2)
        // exactly. The previous row_number spelling sorted the FULL fact
        // under Window.partitionBy(event_type) — ≤5 non-empty partitions,
        // so the data-sized sort ran ≤5-wide on a 32-core box (100×
        // isolated pin: 19.3 s warm) and a hot event_type is one straggler
        // task at any cluster width. Here the fact pass is a map-side
        // partial count into a (event_type, xm) shuffle — fully parallel —
        // and the only window runs over the DISTINCT-VALUE table (the
        // value domain is quantization-bounded: ~9.8k distinct micros per
        // type at every SF vs 2M rows/type at 100×). Integer/decimal
        // carriers match the old spelling term for term, so the output is
        // bit-identical (oracle-verified).
        val vc = ev(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 1e6, 0).cast("long").as("xm"))
          .groupBy("event_type", "xm")
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("xm")
          .rowsBetween(Window.unboundedPreceding, -1)
        val n = col("n").cast(DoubleType)
        val cD = col("c").cast("decimal(38,0)")
        vc.withColumn("m", coalesce(sum("c").over(w), lit(0L)))
          .groupBy("event_type")
          .agg(sum("c").as("n"),
            sum(col("xm") * col("c")).as("sx"),
            // widen BEFORE the products — rank·xm in long wraps at ~2e19
            sum(col("xm").cast("decimal(38,0)") *
              (cD * col("m").cast("decimal(38,0)") +
                expr("(c * (c + 1)) div 2").cast("decimal(38,0)")))
              .as("six"))
          .select(col("event_type"), col("n"),
            round((lit(2.0) * col("six").cast(DoubleType)
              - (n + 1.0) * col("sx").cast(DoubleType))
              / (n * col("sx").cast(DoubleType)), 6).as("gini"))
          .orderBy("event_type")
      },
      Some("""WITH r AS (SELECT event_type,
            CAST(round(value * 1e6) AS BIGINT) AS xm,
            row_number() OVER (PARTITION BY event_type
              ORDER BY CAST(round(value * 1e6) AS BIGINT), event_id) AS i
          FROM events WHERE value IS NOT NULL)
        SELECT event_type, count(*) AS n,
          round((2.0 * CAST(sum(CAST(i AS HUGEINT) * xm) AS DOUBLE)
            - (count(*) + 1.0) * CAST(sum(xm) AS DOUBLE))
            / (CAST(count(*) AS DOUBLE) * CAST(sum(xm) AS DOUBLE)), 6)
            AS gini
        FROM r GROUP BY event_type ORDER BY event_type""")),

    // A23: cohort retention matrix — users bucketed by first-active day
    // (the cohort), counted on each later activity day offset: the
    // retention triangle behind every engagement dashboard. Shape: one
    // distinct (user, day) pass, a per-user min (broadcastable — one row
    // per user), then a count over the already-distinct activity pairs
    // (no second distinct needed). µs→day via integer division.
    QueryDef("a23_cohort_retention",
      (s, dir) => {
        val day = expr("(ts div 1000) div 86400000000")
        val ud = ev(s, dir).select(col("user_id"), day.as("day")).distinct()
        val first = ud.groupBy("user_id").agg(min("day").as("cohort"))
        ud.join(broadcast(first), "user_id")
          .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "day_offset")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS day FROM events),
        f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
        SELECT cohort, day - cohort AS day_offset, count(*) AS n_users
        FROM ud JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort, day_offset""")),

    // A22: OHLC resampling — collapse the event stream to hourly
    // open/high/low/close bars (the time-series downsample primitive;
    // open/close are argmin/argmax over the unique (ts, id) time order,
    // the a10 min_by/max_by pattern). One partial-agged pass, |bars| rows
    // out; at 100 TB the bar key is also the natural partition column.
    QueryDef("a22_ohlc_bars",
      (s, dir) => {
        val e = ev(s, dir).filter(col("value").isNotNull)
          .select(col("event_id"), tsUs.as("ts_us"), col("value"))
          .withColumn("bar", expr("ts_us div 3600000000"))
        e.groupBy("bar").agg(
            count(lit(1)).as("n"),
            min_by(col("value"), struct(col("ts_us"), col("event_id")))
              .as("open"),
            max_by(col("value"), struct(col("ts_us"), col("event_id")))
              .as("close"),
            max("value").as("high"), min("value").as("low"))
          .orderBy("bar")
      },
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, value,
            epoch_us(ts) // 3600000000 AS bar
          FROM events WHERE value IS NOT NULL),
        r AS (SELECT *,
            row_number() OVER (PARTITION BY bar
              ORDER BY ts_us, event_id) AS rf,
            row_number() OVER (PARTITION BY bar
              ORDER BY ts_us DESC, event_id DESC) AS rl
          FROM e)
        SELECT bar, count(*) AS n,
          max(CASE WHEN rf = 1 THEN value END) AS open,
          max(CASE WHEN rl = 1 THEN value END) AS close,
          max(value) AS high, min(value) AS low
        FROM r GROUP BY bar ORDER BY bar""")),

    // W6: RUNNING DISTINCT — count_distinct isn't a window function in any
    // engine, so the distributed spelling is first-occurrence flags (one
    // row_number per (key, item)) running-summed per key: the
    // "vocabulary growth" curve (new event types seen over time per user),
    // emitted at its jump points only. Two key shuffles ((user,type) then
    // user), both map-side-combining flags, never a per-row distinct set.
    QueryDef("w6_running_distinct",
      (s, dir) => {
        val wOcc = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts_us"), col("event_id"))
        val wRun = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
        ev(s, dir)
          .select(col("user_id"), col("event_type"), tsUs.as("ts_us"),
            col("event_id"))
          .withColumn("first_seen",
            (row_number().over(wOcc) === 1).cast("long"))
          .withColumn("n_types_so_far", sum("first_seen").over(wRun))
          .filter(col("first_seen") === 1)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"), col("n_types_so_far"))
          .orderBy("user_id", "n_types_so_far")
      },
      Some("""SELECT user_id, ts_us, event_id, event_type, n_types_so_far
        FROM (SELECT *, CAST(sum(first_seen) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS BIGINT) AS n_types_so_far
          FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
              CAST(row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id) = 1 AS BIGINT) AS first_seen
            FROM events) i) t
        WHERE first_seen = 1 ORDER BY user_id, n_types_so_far""")),

    // A21: population-stability-index drift — did today's value
    // distribution move off the baseline's? PSI = Σ (p−q)·ln(p/q) over the
    // BASELINE's quartile buckets (even event_ids = baseline snapshot, odd
    // = current), per event_type. Scale shape: the bucket edges are one
    // partial-agged percentile per type (broadcast back); each side folds
    // to a 4-row rate table; the PSI terms are micro-quantized before the
    // 4-term sum (order-free — a raw double Σ would depend on partial-agg
    // order). q is floored at 1e-6 (the standard empty-bucket guard).
    QueryDef("a21_psi_drift",
      (s, dir) => {
        val e = ev(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"), col("value"))
        val base = e.filter(col("event_id") % 2 === 0)
        val curr = e.filter(col("event_id") % 2 === 1)
        val th = base.groupBy("event_type")
          .agg(expr("percentile(value, array(0.25, 0.5, 0.75))").as("q"))
        def bucketed(df: DataFrame, n: String) =
          df.join(broadcast(th), Seq("event_type"))
            .withColumn("bucket",
              when(col("value") <= col("q")(0), 0L)
                .when(col("value") <= col("q")(1), 1L)
                .when(col("value") <= col("q")(2), 2L)
                .otherwise(3L))
            .groupBy("event_type", "bucket").agg(count(lit(1)).as(n))
        val b = bucketed(base, "nb")
        val c = bucketed(curr, "nc")
        val joined = b.join(c, Seq("event_type", "bucket"), "full_outer")
          .na.fill(0L, Seq("nb", "nc"))
        val tot = joined.groupBy("event_type")
          .agg(sum("nb").as("tb"), sum("nc").as("tc"))
        // BOTH sides floored: tied quartile edges can empty a baseline
        // bucket too, and ln(0) would overflow the quantizer
        val p = greatest(col("nb").cast(DoubleType) / col("tb"), lit(1e-6))
        val q = greatest(col("nc").cast(DoubleType) / col("tc"), lit(1e-6))
        joined.join(broadcast(tot), Seq("event_type"))
          .withColumn("term_micros",
            round((p - q) * log(p / q) * 1e6, 0).cast("long"))
          .groupBy("event_type")
          .agg(sum("nb").as("n_base"), sum("nc").as("n_curr"),
            round(sum("term_micros").cast(DoubleType) / 1e6, 6).as("psi"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, event_id, value FROM events
          WHERE value IS NOT NULL),
        th AS (SELECT event_type,
            quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.5) AS q2,
            quantile_cont(value, 0.75) AS q3
          FROM e WHERE event_id % 2 = 0 GROUP BY event_type),
        bk AS (SELECT e.event_type, event_id % 2 AS side,
            CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
              WHEN value <= q3 THEN 2 ELSE 3 END AS bucket
          FROM e JOIN th ON e.event_type = th.event_type),
        r AS (SELECT event_type, bucket,
            count(*) FILTER (side = 0) AS nb,
            count(*) FILTER (side = 1) AS nc
          FROM bk GROUP BY 1, 2),
        t AS (SELECT event_type, sum(nb) AS tb, sum(nc) AS tc FROM r
          GROUP BY 1)
        SELECT r.event_type,
          CAST(sum(nb) AS BIGINT) AS n_base, CAST(sum(nc) AS BIGINT) AS n_curr,
          round(CAST(CAST(sum(CAST(round(
            (greatest(CAST(nb AS DOUBLE) / tb, 1e-6)
              - greatest(CAST(nc AS DOUBLE) / tc, 1e-6))
            * ln(greatest(CAST(nb AS DOUBLE) / tb, 1e-6)
              / greatest(CAST(nc AS DOUBLE) / tc, 1e-6)) * 1000000)
            AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0, 6) AS psi
        FROM r JOIN t ON r.event_type = t.event_type
        GROUP BY r.event_type ORDER BY r.event_type""")),

    // A20: per-group MODE with a deterministic tie rule — Spark's mode()
    // returns an ARBITRARY value on frequency ties (partition-order-
    // dependent, would flunk the driver hash), so the catalog spelling is
    // the two-level count → max_by((n, key)) form: exact, tie → lexically
    // smallest, and both aggregates partial-combine map-side (the first
    // collapses to |group×value| rows, the second to |group|).
    QueryDef("a20_mode",
      (s, dir) => ev(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(max("n").as("top_n"),
          // min over (-n, type): max frequency, then lexically smallest
          min_by(col("event_type"),
            struct((-col("n")).as("nn"), col("event_type")))
            .as("mode_type"))
        .orderBy("user_id"),
      Some("""SELECT user_id, max(n) AS top_n,
          (SELECT event_type FROM (SELECT user_id AS u, event_type,
             count(*) AS n FROM events GROUP BY 1, 2) i
           WHERE i.u = o.user_id ORDER BY n DESC, event_type LIMIT 1)
            AS mode_type
        FROM (SELECT user_id, event_type, count(*) AS n FROM events
          GROUP BY 1, 2) o
        GROUP BY user_id ORDER BY user_id""")),

    // A19: equi-DEPTH histogram — quartile-bucketed value distribution, the
    // complement of a14's fixed-width bins (equi-depth adapts bin edges to
    // the data, the profile optimizers and drift monitors actually want).
    // Scale shape = e4_quality_p75's: one exact-percentile agg (partial-
    // agged, array of 3 cut points) broadcasts back; bucket assignment is
    // map-side; percentile interpolation is the driver-proven a9 formula.
    QueryDef("a19_equidepth_hist",
      (s, dir) => {
        val e = ev(s, dir).filter(col("value").isNotNull)
          .select("event_id", "value")
        val th = e.agg(
          expr("percentile(value, array(0.25, 0.5, 0.75))").as("q"))
        e.crossJoin(broadcast(th))
          .withColumn("bucket",
            when(col("value") <= col("q")(0), 0L)
              .when(col("value") <= col("q")(1), 1L)
              .when(col("value") <= col("q")(2), 2L)
              .otherwise(3L))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            round(min("value"), 6).as("v_min"),
            round(max("value"), 6).as("v_max"))
          .orderBy("bucket")
      },
      Some("""WITH th AS (SELECT quantile_cont(value, 0.25) AS q1,
            quantile_cont(value, 0.5) AS q2,
            quantile_cont(value, 0.75) AS q3 FROM events)
        SELECT CAST(CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
            WHEN value <= q3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
          count(*) AS n, round(min(value), 6) AS v_min,
          round(max(value), 6) AS v_max
        FROM events CROSS JOIN th WHERE value IS NOT NULL
        GROUP BY 1 ORDER BY 1""")),

    // C3x: null semantics — the null-safe equality operator (<=> /
    // IS NOT DISTINCT FROM) the rest of the catalog never exercises, plus
    // null counting vs SQL three-valued logic: a run is "repeated" when the
    // value null-safely equals its predecessor (NULL repeats NULL; a plain
    // = would drop those rows silently).
    QueryDef("c3_null_semantics",
      (s, dir) => {
        // µs window order per the module precision contract: ordering by
        // raw ns here while DuckDB sees µs-truncated timestamps would let a
        // sub-µs tie order differently in the two engines
        val w = Window.partitionBy("user_id").orderBy(tsUs, col("event_id"))
        ev(s, dir).filter(col("user_id") < 100)
          .select(col("user_id"), col("value"),
            lag("value", 1).over(w).as("prev"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").isNull.cast("long")).as("n_null_value"),
            sum((col("value") <=> col("prev")).cast("long"))
              .as("n_nullsafe_rep"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_rows,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null_value,
        CAST(sum(CASE WHEN value IS NOT DISTINCT FROM prev THEN 1 ELSE 0 END)
          AS BIGINT) AS n_nullsafe_rep
        FROM (SELECT user_id, value, lag(value) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
          FROM events WHERE user_id < 100) t
        GROUP BY user_id ORDER BY user_id""")),

    // J6: FULL OUTER join — the one join type the rest of the catalog
    // doesn't exercise (inner j1/j2, semi/anti j3, salted j4, as-of e9,
    // range r3). Two sparse per-user aggregates (low-value and high-value
    // event counts) genuinely miss users on both sides, so both unmatched
    // directions appear in the result. Key-partitioned hash join.
    QueryDef("j6_full_outer",
      (s, dir) => {
        val lo = ev(s, dir).filter(col("value") < 10)
          .groupBy("user_id").agg(count(lit(1)).as("n_low"))
        val hi = ev(s, dir).filter(col("value") >= 90)
          .groupBy("user_id").agg(count(lit(1)).as("n_high"))
        lo.join(hi, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_low"), lit(0L)).as("n_low"),
            coalesce(col("n_high"), lit(0L)).as("n_high"))
          .orderBy("user_id")
      },
      Some("""WITH lo AS (SELECT user_id, count(*) AS n_low FROM events
          WHERE value < 10 GROUP BY user_id),
        hi AS (SELECT user_id, count(*) AS n_high FROM events
          WHERE value >= 90 GROUP BY user_id)
        SELECT COALESCE(lo.user_id, hi.user_id) AS user_id,
          COALESCE(n_low, 0) AS n_low, COALESCE(n_high, 0) AS n_high
        FROM lo FULL OUTER JOIN hi ON lo.user_id = hi.user_id
        ORDER BY user_id""")),

    // W3: time-RANGE window frame — the rolling "last hour per key" metric.
    // Semantically distinct from w1's ROWS frame: the frame is bounded by
    // the ORDER-BY VALUE (all events within 3600s), not a row count, and
    // ties on the order value are all in-frame. Same scale posture as any
    // keyed window (one hash exchange, per-key partitions). Decimal-carrier
    // sum for cross-engine hash stability.
    QueryDef("w3_time_range_window",
      (s, dir) => {
        import graft.functions.Carriers.micros
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        ev(s, dir).filter(col("user_id") < 50)
          .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
            col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h_micros",
            micros(sum(col("value").cast("decimal(18,6)")).over(w)))
          .select("user_id", "event_id", "ts_us", "n_1h", "sum_1h_micros")
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some(s"""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        count(*) OVER w AS n_1h,
        ${graft.functions.Carriers.microsSql(
          "sum(CAST(value AS DECIMAL(18,6))) OVER w")} AS sum_1h_micros
        FROM events WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id""")),

    // A13: key-skew profiler — the diagnostic that decides when a join needs
    // j4's salting: per-key counts (map-side partial agg, ~1 row/key on the
    // wire), then a one-row skew summary (hottest key, max/avg ratio).
    // Deterministic hot key via max_by on (n, -key): ties resolve to the
    // smallest key in both engines.
    QueryDef("a13_key_skew",
      (s, dir) => {
        val counts = ev(s, dir).groupBy("user_id").agg(count(lit(1)).as("n"))
        counts.agg(
          count(lit(1)).as("n_keys"),
          sum("n").as("n_rows"),
          max("n").as("hot_n"),
          max_by(col("user_id"), struct(col("n"), (-col("user_id")).as("nk")))
            .as("hot_key"),
          round(max("n").cast(DoubleType) * count(lit(1)) / sum("n"), 6)
            .as("skew_ratio"))
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS n FROM events
          GROUP BY user_id)
        SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
          max(n) AS hot_n,
          (SELECT user_id FROM c ORDER BY n DESC, user_id LIMIT 1) AS hot_key,
          round(CAST(max(n) AS DOUBLE) * count(*) / sum(n), 6) AS skew_ratio
        FROM c""")),

    // A27: exact heavy hitters WITHOUT shuffling the key space — the
    // per-partition Misra-Gries nomination + exact confirming pass
    // ([[graft.operators.HeavyHitters]]; superset guarantee makes the final
    // answer exact and partition-layout-independent, so the DuckDB oracle is
    // the plain HAVING query). The key is deliberately the heavy-hitter
    // regime a13's groupBy can't survive at 100 TB: ~row-count cardinality
    // (one cold key per event) with a 10-key hot set riding on top.
    QueryDef("a27_heavy_hitters",
      (s, dir) => {
        val keyed = ev(s, dir).select(
          when(col("user_id") < 10, concat(lit("hot_"), col("user_id")))
            .otherwise(concat(lit("cold_"), col("event_id"))).as("k"))
        graft.operators.HeavyHitters.heavyHitters(keyed, col("k"), 0.003)
          .orderBy("key")
      },
      Some("""WITH k AS (SELECT CASE WHEN user_id < 10
            THEN 'hot_' || user_id ELSE 'cold_' || event_id END AS key
          FROM events)
        SELECT key, count(*) AS n_key,
          (SELECT count(*) FROM k) AS n_total
        FROM k GROUP BY key
        HAVING count(*) > 0.003 * (SELECT count(*) FROM k)
        ORDER BY key""")),

    // A14: fixed-width histogram (binning) — floor(value/width) buckets with
    // exact double division so both engines land identical bins; map-side
    // partial-aggregated, one tiny bucket table on the wire.
    QueryDef("a14_value_histogram",
      (s, dir) => ev(s, dir)
        .groupBy(floor(col("value") / 10.0d).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min("value"), 6).as("v_min"),
          round(max("value"), 6).as("v_max"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        count(*) AS n, round(min(value), 6) AS v_min,
        round(max(value), 6) AS v_max
        FROM events GROUP BY 1 ORDER BY bucket""")),

    // Q1-Q6 QC predicate bundle (battery/Qc.scala shapes phrased over the
    // events table so the QC aggregate gets a driver-checked row): null
    // count, value range, first→last drift, positivity, median threshold,
    // max-abs threshold — one multi-aggregate scan, one output row, each
    // check emitted as a 0/1 BIGINT flag next to its measured aggregate.
    QueryDef("q2_qc_bundle",
      (s, dir) => {
        val e = ev(s, dir)
        e.agg(
            sum(when(col("value").isNull, 1).otherwise(0)).as("n_null_value"),
            round(min("value"), 6).as("v_min"),
            round(max("value"), 6).as("v_max"),
            round(min_by(col("value"), struct(ord: _*)), 6).as("first_v"),
            round(max_by(col("value"), struct(ord: _*)), 6).as("last_v"),
            sum(when(col("value") <= 0, 1).otherwise(0)).as("n_nonpos"),
            round(median(col("value")), 6).as("v_med"),
            round(max(abs(col("value"))), 6).as("v_max_abs"))
          .select(col("*"),
            (col("n_null_value") === 0).cast("long").as("ok_nulls"),
            (col("v_min") >= -1e6 && col("v_max") <= 1e6).cast("long")
              .as("ok_range"),
            when(col("first_v").isNull || col("last_v").isNull ||
              col("first_v") === 0, lit(1L))
              .otherwise(((col("last_v") - col("first_v")) / col("first_v")
                <= 0.02).cast("long")).as("ok_drift"),
            (col("n_nonpos") === 0).cast("long").as("ok_positive"),
            (col("v_med") <= 200.0).cast("long").as("ok_median"),
            (col("v_max_abs") <= 1e6).cast("long").as("ok_shift"))
      },
      Some("""WITH r AS (SELECT value,
          row_number() OVER (ORDER BY ts, event_id) rf,
          row_number() OVER (ORDER BY ts DESC, event_id DESC) rl
        FROM events),
      a AS (SELECT
          count(*) FILTER (WHERE value IS NULL) AS n_null_value,
          round(min(value), 6) AS v_min,
          round(max(value), 6) AS v_max,
          round(max(value) FILTER (WHERE rf = 1), 6) AS first_v,
          round(max(value) FILTER (WHERE rl = 1), 6) AS last_v,
          count(*) FILTER (WHERE value <= 0) AS n_nonpos,
          round(median(value), 6) AS v_med,
          round(max(abs(value)), 6) AS v_max_abs
        FROM r)
      SELECT a.*,
        CAST(n_null_value = 0 AS BIGINT) AS ok_nulls,
        CAST(v_min >= -1e6 AND v_max <= 1e6 AS BIGINT) AS ok_range,
        CASE WHEN first_v IS NULL OR last_v IS NULL OR first_v = 0 THEN 1
             ELSE CAST((last_v - first_v) / first_v <= 0.02 AS BIGINT)
        END AS ok_drift,
        CAST(n_nonpos = 0 AS BIGINT) AS ok_positive,
        CAST(v_med <= 200.0 AS BIGINT) AS ok_median,
        CAST(v_max_abs <= 1e6 AS BIGINT) AS ok_shift
      FROM a"""))
  )
}
