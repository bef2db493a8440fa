"""Batch time-series analytics over the ``events`` table: gaps-and-
islands sessionization, hierarchical time-bucket rollups (the
"hypertable continuous aggregate" shape), and day-cohort retention.

The reference has no time-series surface at all (its two pages are
point-in-time lookups, streamlit_app.py:109-177); these are the batch
twins of the Structured Streaming queries in streaming_queries.py —
same event data, pure DataFrame plans, each DuckDB-oracle-checked.

Scale notes: every query here is one window or one groupBy keyed on
(user_id) or a time bucket — both high-cardinality, shuffle-friendly
keys. Sessionization's window sort is per-user (no global sort);
rollups are two-phase hash aggregates; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table

SESSION_GAP_S = 30 * 60  # same 30-min gap as streaming_queries sessions

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

# Double sums are order-dependent across engines (different partial-agg
# orders flip the low bits, and ROUND at a boundary then flips a digit).
# Route every SUM/AVG over a double column through an exact DECIMAL(28,10)
# accumulator on BOTH engines — same rule as relational._dec_sum.
_DEC = "decimal(28,10)"


def _dec_sum(col, digits=4):
    return F.round(F.sum(col.cast(_DEC)).cast("double"), digits)


def _dec_avg(col, digits=6):
    return F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(col), digits)


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the user's previous event exceeds ``gap_s`` seconds.
    session_no = running count of session starts per user (1-based),
    so (user_id, session_no) is a stable session key.

    Gap compare uses fractional epoch seconds (``ts.cast(double)``
    keeps microseconds) — truncating to whole seconds would misfile
    events that straddle the gap boundary within one second.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(float(gap_s))), 1
    ).otherwise(0)
    return events.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session summary: bounds, event count, total value."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value")).alias("total_value"),
        )
    )


_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_S}
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS total_value
FROM numbered GROUP BY user_id, session_no
"""


def q_batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window`` operator in BATCH mode (round
    6 — the streaming module already drives it under watermarks; this
    pins the same merge semantics on a plain groupBy): per-user
    sessions under the 30-min gap, window.end = last event + gap. The
    merge rule is the one the streaming parity test pinned — an event
    at EXACTLY last+gap merges — which is also sessionize()'s ``>``
    rule, so the oracle reuses the gaps-and-islands CTE and adds the
    gap to the island's max(ts) for session_end."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            F.date_format("w.end", _TS_FMT).alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )


_BATCH_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_S}
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL {SESSION_GAP_S} SECOND,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS total_value
FROM numbered GROUP BY user_id, session_no
"""


def q_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-bucket rollup per event type: (day, hour)
    detail -> per-day subtotal -> per-type total, one pass via ROLLUP
    grouping sets — the continuous-aggregate/"hypertable rollup" shape.
    Finer buckets shuffle more groups, not more rows: partial
    aggregation reduces each scan task to its local groups first."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), _TS_FMT).alias("hour"),
        "value",
    )
    return ev.rollup("event_type", "day", "hour").agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value")).alias("total_value"),
        _dec_avg(F.col("value")).alias("avg_value"),
    )


_ROLLUP_HT_SQL = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS total_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(value), 6)
         AS avg_value
FROM events
GROUP BY ROLLUP (event_type, day, hour)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: users grouped by first-seen day;
    for each (cohort_day, day_offset) the count of distinct users from
    that cohort active that many days later. Two shuffles: min-ts per
    user (high-cardinality key), then the cohort-cell distinct count."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_ts")
    )
    joined = ev.join(first_seen, "user_id")
    return (
        joined.select(
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.date_trunc("day", "ts"), "cohort_ts")
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_ts
  FROM events GROUP BY user_id
)
SELECT strftime(f.cohort_ts, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', f.cohort_ts, date_trunc('day', e.ts)) AS BIGINT)
         AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomalies: events whose value deviates
    more than 3 population-stddevs from their type's mean. The
    per-type stats are a tiny aggregate joined back broadcast — one
    full scan, no window state. (The streaming twin keeps (mean, var)
    as running state; same predicate.)

    mu/sigma are derived from exact DECIMAL sums (sum, sum-of-squares)
    rather than AVG/STDDEV_POP over doubles: native double moments are
    accumulation-order-dependent and engines disagree in the low bits,
    which flips both the ROUND digit and the |z|>3 boundary."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("value")).alias("mu"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC)).cast("double").alias("sumsq"),
        F.count("value").alias("n"),
    )
    sigma = F.sqrt(F.col("sumsq") / F.col("n") - F.col("mu") * F.col("mu"))
    z = (F.col("value") - F.col("mu")) / sigma
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
    )


_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(value) AS mu,
         CAST(SUM(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS sumsq,
         COUNT(value) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.mu) / sqrt(s.sumsq / s.n - s.mu * s.mu), 6) AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE ABS((e.value - s.mu) / sqrt(s.sumsq / s.n - s.mu * s.mu)) > 3.0
"""


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample purchase values to a dense hourly grid per user and
    forward-fill gaps — the hypertable ``time_bucket_gapfill + locf``
    operation. The spine is a per-user ``sequence`` explode (distributed,
    no driver loop); the fill is ``last(ignorenulls)`` over a
    per-user window, so state per task is one row. ``max_by(value,
    event_id)`` pins a deterministic in-bucket winner on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.max_by("value", "event_id").alias("obs_value"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        F.round(F.last("obs_value", ignorenulls=True).over(w), 6).alias("value_ffill"),
    )


_RESAMPLE_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, max_by(value, event_id) AS obs_value
  FROM events WHERE user_id < 20 AND event_type = 'purchase'
  GROUP BY 1, 2),
span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span)
SELECT s.user_id, s.hour,
       ROUND(last_value(h.obs_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov / path-
    analysis shape behind 'what do users do after a click'): lead()
    over each user's (ts, event_id) order pairs every event with its
    successor; one window + one count aggregate. Transition
    probability = count / row-total — an int/int IEEE division,
    engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wrow = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")).alias("p"),
    )


_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
FROM counts
"""


def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to the dense hourly grid with LINEAR interpolation
    between known points (the gapfill ``interpolate`` sibling of
    locf): prev/next known (value, hour) via ignorenulls window edges,
    then ``prev + (next - prev) * gap_frac``. Every arithmetic step is
    a correctly-rounded IEEE op evaluated in the same order on both
    engines (int-second gaps -> one division -> one mul -> one add),
    rounded to 6 digits at the edge. Spine rows before/after the known
    range fall back to the nearest known value."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.max_by("value", "event_id").cast("double").alias("obs_value"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs = F.col("obs_value")
    known_h = F.when(obs.isNotNull(), F.col("hour"))
    prev_v = F.last(obs, ignorenulls=True).over(wp)
    prev_h = F.last(known_h, ignorenulls=True).over(wp)
    next_v = F.first(obs, ignorenulls=True).over(wn)
    next_h = F.first(known_h, ignorenulls=True).over(wn)
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp(prev_h)).cast("double")
        / (F.unix_timestamp(next_h) - F.unix_timestamp(prev_h)).cast("double")
    )
    interp = (
        F.when(obs.isNotNull(), obs)
        .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * frac)
        .otherwise(F.coalesce(prev_v, next_v))
    )
    # round() ties are REAL here: 2-decimal values x rational hour
    # fracs produce exact .5 cases at the 6th digit, where Spark
    # rounds HALF_UP and DuckDB's double round is half-even (measured:
    # 132.9781875). floor-scaled micro-units are tie-free.
    return joined.select(
        "user_id",
        "hour",
        F.floor(interp * F.lit(1000000.0)).cast("long").alias("interp_micro"),
    )


_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(max_by(value, event_id) AS DOUBLE) AS obs_value
  FROM events WHERE user_id < 20 AND event_type = 'purchase'
  GROUP BY 1, 2),
span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span),
edges AS (
  SELECT s.user_id, s.hour, h.obs_value,
         last_value(h.obs_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN h.obs_value IS NOT NULL THEN s.hour END IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         first_value(h.obs_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN h.obs_value IS NOT NULL THEN s.hour END IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour)
SELECT user_id, hour,
       CAST(floor((CASE
         WHEN obs_value IS NOT NULL THEN obs_value
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
           prev_v + (next_v - prev_v)
           * (CAST(date_diff('second', prev_h, hour) AS DOUBLE)
              / CAST(date_diff('second', prev_h, next_h) AS DOUBLE))
         ELSE COALESCE(prev_v, next_v) END) * 1000000.0) AS BIGINT) AS interp_micro
FROM edges
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type — the financial-rollup shape:
    first/last are ``min_by``/``max_by`` on a composite (ts, event_id)
    order key packed into one BIGINT so both engines break intra-
    microsecond ties identically. Pure two-phase agg, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    order_key = F.unix_micros("ts") * 1000 + F.pmod("event_id", 1000)
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.round(F.min_by("value", order_key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", order_key), 6).alias("close"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


_OHLC_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       ROUND(min_by(value, epoch_us(ts) * 1000 + event_id % 1000), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(max_by(value, epoch_us(ts) * 1000 + event_id % 1000), 6) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""


def q_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 z-normalized matches of a rising-ramp pattern among all
    8-step windows of every user's event-value series (UCR subsequence
    search, operators/tsmatch.py). Oracle-checked since round 11: the
    sliding z-norm IS SQL-expressible as list arithmetic over an
    8-row window frame — both sides sum the same 8 doubles in ts
    order, so the distances agree bit-for-bit before the 6dp round;
    the numpy kernel prunes on the (rounded dist, start_ts) key the
    global orderBy and the oracle rank by, so a boundary tie cannot
    diverge. Also numpy-brute-force pinned in tests/test_tsmatch.py."""
    from providenciasbigdata_spark.operators.tsmatch import znorm_pattern_topk

    ev = load_table(spark, sf_dir, "events")
    return znorm_pattern_topk(ev, pattern=list(range(8)), k=10).select(
        "user_id", F.date_format("start_ts", _TS_FMT).alias("start_ts"), "dist"
    )


def _znorm_literal(pattern) -> str:
    """The z-normalized pattern as a full-precision SQL list literal
    (repr round-trips doubles exactly)."""
    import numpy as np

    a = np.asarray(pattern, dtype=np.float64)
    qn = (a - a.mean()) / a.std()
    return "[" + ", ".join(repr(float(x)) for x in qn) + "]"


_QN8 = _znorm_literal(range(8))

_PATTERN_TOPK_SQL = f"""
WITH wins AS (
  SELECT user_id, ts AS start_ts,
         list(value) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
  FROM events
),
full8 AS (SELECT * FROM wins WHERE len(w) = 8),
m AS (SELECT user_id, start_ts, w, list_sum(w) / 8.0 AS mu FROM full8),
s AS (SELECT *, sqrt(list_sum(list_transform(w, x -> (x - mu) * (x - mu))) / 8.0) AS sd
      FROM m),
d AS (
  SELECT user_id, start_ts,
         ROUND(sqrt(list_sum(list_transform(range(1, 9),
           i -> ((w[i] - mu) / sd - ({_QN8})[i])
                * ((w[i] - mu) / sd - ({_QN8})[i])))), 6) AS dist
  FROM s WHERE sd > 0
)
SELECT user_id, strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts, dist
FROM d ORDER BY dist, user_id, start_ts LIMIT 10
"""


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling MEDIAN over the trailing 5 events — the robust
    smoother rolling AVG isn't (one outlier drags a mean for the whole
    window). Exact continuous-interpolation percentile as a window
    aggregate over a bounded ROWS frame: state per window is 5 values,
    so the shuffle is one hash partition by user and the frame never
    grows with history. Total order via (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(value, 0.5D)").over(w), 6).alias("med5"),
    )


_ROLLING_MEDIAN_SQL = """
SELECT user_id, event_id,
       ROUND(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
FROM events WHERE user_id < 50
"""


def q_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-week bucketing (ISO Monday weeks — both engines'
    date_trunc('week') agree, verified): weekly order count + exact
    decimal revenue per status. The calendar sibling of the
    hour/day-bucket hypertable rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,10)")).cast("double"), 2
            ).alias("revenue"),
        )
    )


_WEEKLY_REVENUE_SQL = """
SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
FROM orders
GROUP BY 1, 2
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation + the modified z-score rule (Iglewicz-Hoaglin:
    0.6745·|x−med|/MAD > 3.5) — the median-based sibling of
    anomaly_value_outliers' mean/σ z-score, immune to the outliers it
    hunts. Both medians are exact interpolated percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont``); the outlier test is
    cross-MULTIPLIED (0.6745·|x−med| > 3.5·MAD) so no division enters
    the comparison, and the reported med/mad are rounded only at the
    projection edge. Three passes over events, each a hash aggregate;
    at scale the first two collapse to one window pass if events are
    already bucketed by type."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                (F.lit(0.6745) * F.col("adev") > F.lit(3.5) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = """
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM ev GROUP BY event_type),
dev AS (SELECT ev.event_type, ABS(ev.value - med.med) AS adev, med.med
        FROM ev JOIN med USING (event_type)),
mad AS (SELECT event_type, med, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type, med)
SELECT d.event_type,
       ROUND(MAX(m.med), 6) AS median_value,
       ROUND(MAX(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN 0.6745 * d.adev > 3.5 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


def q_ewma_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average per user
    (round 6): s_t = Σ_{j=0..K-1} α(1−α)^j · x_{t−j} over the event
    sequence, K=8, α=0.3 — the trend-smoothing primitive (monitoring
    dashboards, feature pipelines). The infinite-memory recursive EWMA
    is not SQL-expressible; TRUNCATING the tail (weights below
    α(1−α)^K ≈ 1.7% dropped, adjust=False semantics) turns it into a
    dot product of the last K values with PRECOMPUTED weight literals
    — a collect_list window + one left-to-right aggregate fold, which
    both engines evaluate in the identical multiply-add order, so the
    doubles value-hash UNROUNDED. Plan: one per-user window, no UDF,
    no global sort."""
    alpha, k = 0.3, 8
    weights = [alpha * (1 - alpha) ** j for j in range(k)]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("value").cast("double").alias("x")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(-(k - 1), 0)
    )
    # newest-first value list: element i pairs with weight α(1−α)^i
    vals = F.reverse(F.collect_list("x").over(w))
    wlit = F.array(*[F.lit(float(wt)) for wt in weights])
    ewma = F.aggregate(
        F.zip_with(vals, F.slice(wlit, 1, F.size(vals)), lambda v, wt: v * wt),
        F.lit(0.0),
        lambda acc, term: acc + term,
    )
    return ev.select(
        "user_id", "event_id", "x", ewma.alias("ewma")
    ).filter(F.col("user_id") < 50)


def _ewma_sql() -> str:
    alpha, k = 0.3, 8
    weights = [alpha * (1 - alpha) ** j for j in range(k)]
    wlist = "[" + ", ".join(repr(float(wt)) for wt in weights) + "]"
    return f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS x FROM events
), win AS (
  SELECT user_id, event_id, x,
         list_reverse(list(x) OVER (PARTITION BY user_id ORDER BY event_id ASC
                      ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)) AS vals
  FROM ev)
SELECT user_id, event_id, x,
       list_reduce(
         list_prepend(0.0,
           list_transform(range(1, len(vals) + 1),
                          i -> vals[i] * ({wlist})[i])),
         (acc, term) -> acc + term) AS ewma
FROM win WHERE user_id < 50
"""


QUERIES = {
    "timeseries_ewma_truncated": (q_ewma_truncated, _ewma_sql()),
    "anomaly_mad_outliers": (q_mad_outliers, _MAD_SQL),
    "timeseries_weekly_revenue": (q_weekly_revenue, _WEEKLY_REVENUE_SQL),
    "timeseries_resample_ffill": (q_resample_ffill, _RESAMPLE_SQL),
    "timeseries_resample_interpolate": (q_resample_interpolate, _INTERPOLATE_SQL),
    "timeseries_event_transitions": (q_event_transitions, _TRANSITIONS_SQL),
    "timeseries_ohlc_bars": (q_ohlc_bars, _OHLC_SQL),
    "timeseries_rolling_median": (q_rolling_median, _ROLLING_MEDIAN_SQL),
    "sessionize_events": (q_sessionize_events, _SESSIONIZE_SQL),
    "batch_session_window": (q_batch_session_window, _BATCH_SESSION_WINDOW_SQL),
    "anomaly_value_outliers": (q_value_outliers, _OUTLIERS_SQL),
    "rollup_hypertable": (q_rollup_hypertable, _ROLLUP_HT_SQL),
    "cohort_retention": (q_cohort_retention, _COHORT_SQL),
    "timeseries_pattern_topk": (q_pattern_topk, _PATTERN_TOPK_SQL),
}

WHY_NO_ORACLE: dict[str, str] = {}
