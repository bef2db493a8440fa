"""Streaming-surface queries over ``events`` (SURVEY.md §2.4 streaming
row), declared through their batch-equivalent form: each registry entry
runs the SAME transformation function a streaming job uses (batch/stream
parity is the module contract, see providenciasbigdata_spark/streaming.py)
on the batch events table, so the DuckDB oracle can check the windowing
semantics exactly. True streaming execution (availableNow trigger,
watermarks, stateful ops) is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark import streaming
from providenciasbigdata_spark.io import load_table


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.tumbling_counts(load_table(spark, sf_dir, "events"), width="1 hour")


_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.sliding_counts(
        load_table(spark, sf_dir, "events"), width="1 hour", slide="30 minutes"
    )


# Each event belongs to exactly width/slide = 2 hopping windows whose
# starts are the two 30-min boundaries in (ts - 1h, ts].
_SLIDING_SQL = """
SELECT ws AS window_start,
       ws + INTERVAL '1 hour' AS window_end,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (i * INTERVAL '30 minutes') AS ws,
         value
  FROM events, UNNEST([0, 1]) AS t(i)
)
GROUP BY 1, 2
"""


def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.session_windows(load_table(spark, sf_dir, "events"), gap="30 minutes")


# Classic lag-gap sessionization: a new session starts when the gap to
# the previous event EXCEEDS 30 min (Spark merges an event landing at
# exactly last+gap — boundary-inclusive; pinned by
# tests/test_streaming.py::test_session_window_gap_boundary).
_SESSIONS_SQL = """
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM (
  SELECT user_id, ts,
         SUM(CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts) AS session_id
  FROM (
    SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
  )
)
GROUP BY user_id, session_id
"""


def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        streaming.dedup_events(load_table(spark, sf_dir, "events"))
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n_unique_events")
    )


_DEDUP_EVENTS_SQL = """
SELECT event_type, COUNT(*) AS n_unique_events
FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id)
GROUP BY event_type
"""


def q_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.user_running_totals(load_table(spark, sf_dir, "events"))


_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS total_value
FROM events
GROUP BY user_id
"""


def q_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.purchase_then_click(
        load_table(spark, sf_dir, "events"), within="30 minutes"
    )


_PURCHASE_CLICK_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       date_diff('second', p.ts, c.ts) AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts > p.ts
 AND c.ts <= p.ts + INTERVAL '30 minutes'
"""


def q_purchase_click_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.purchase_then_click_outer(
        load_table(spark, sf_dir, "events"), within="30 minutes"
    )


_PURCHASE_CLICK_OUTER_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       date_diff('second', p.ts, c.ts) AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts > p.ts
 AND c.ts <= p.ts + INTERVAL '30 minutes'
"""


def q_purchase_click_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.purchase_then_click_full_outer(
        load_table(spark, sf_dir, "events"), within="30 minutes"
    )


_PURCHASE_CLICK_FULL_SQL = """
SELECT COALESCE(p.user_id, c.user_id) AS user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       date_diff('second', p.ts, c.ts) AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts > p.ts
 AND c.ts <= p.ts + INTERVAL '30 minutes'
"""


def q_enrich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: events x customer
    mktsegment (user_id keys into c_custkey on the fixtures)."""
    profiles = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment"))
    )
    return streaming.enrich_with_profile(
        load_table(spark, sf_dir, "events"), profiles
    )


_ENRICH_SQL = """
SELECT COALESCE(c.c_mktsegment, 'unknown') AS segment,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


def q_route_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-side governance router (PII quarantine / quality gate),
    batch form of streaming.route_documents — stateless, so the oracle
    checks the streaming semantics exactly."""
    return streaming.route_documents(load_table(spark, sf_dir, "documents"))


def _route_documents_sql() -> str:
    from providenciasbigdata_spark.functions.text import PII_PATTERNS
    from providenciasbigdata_spark.queries.pipeline import _TEXT_QUALITY_SQL

    pii = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    return f"""
WITH q AS ({_TEXT_QUALITY_SQL}),
p AS (SELECT doc_id, CAST(({pii} > 0) AS BIGINT) AS has_pii FROM documents)
SELECT q.doc_id, q.quality, p.has_pii,
       CASE WHEN p.has_pii = 1 THEN 'quarantine'
            WHEN q.quality IS NULL OR q.quality < 0.5 THEN 'rejected'
            ELSE 'accepted' END AS route
FROM q JOIN p USING (doc_id)
"""


def q_ohlc_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.ohlc_windows(load_table(spark, sf_dir, "events"), width="1 hour")


_OHLC_WINDOWS_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       ROUND(min_by(value, epoch_us(ts) * 1000 + event_id % 1000), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(max_by(value, epoch_us(ts) * 1000 + event_id % 1000), 6) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3
"""


def q_purchase_click_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.purchase_with_click_semi(
        load_table(spark, sf_dir, "events"), within="30 minutes"
    )


_PURCHASE_CLICK_SEMI_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, p.ts AS p_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
WHERE EXISTS (
  SELECT 1 FROM events c
  WHERE c.event_type = 'click' AND c.user_id = p.user_id
    AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL '30 minutes')
"""


def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming.session_windows_dynamic(load_table(spark, sf_dir, "events"))


# Dynamic-gap sessionization = interval union: each event opens
# [ts, ts + gap(event)); a new session starts when ts exceeds the
# running MAX of previous interval ends (boundary-INCLUSIVE merge, as
# the static-gap pin); session_end = MAX(ts + gap) within the island.
_SESSIONS_DYNAMIC_SQL = """
WITH g AS (
  SELECT user_id, ts, event_type,
         ts + CASE WHEN event_type = 'purchase'
                   THEN INTERVAL '60 minutes' ELSE INTERVAL '30 minutes' END AS w_end
  FROM events
), marked AS (
  SELECT user_id, ts, event_type, w_end,
         CASE WHEN prev_max_end IS NULL OR ts > prev_max_end THEN 1 ELSE 0 END AS is_new
  FROM (
    SELECT user_id, ts, event_type, w_end,
           MAX(w_end) OVER (PARTITION BY user_id ORDER BY ts, w_end
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
    FROM g
  )
), islands AS (
  SELECT user_id, ts, event_type, w_end,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, w_end) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(w_end) AS session_end,
       COUNT(*) AS n_events,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases
FROM islands
GROUP BY user_id, session_id
"""


def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-fingerprint ingest dedup (round 7,
    streaming.dedup_documents_fingerprint): SimHash attached in-stream,
    one survivor per fingerprint — re-crawled near-identical copies
    drop at ingest. This batch formulation is the shared
    transformation (min-doc_id winner); the streamed form
    (dropDuplicatesWithinWatermark, fingerprint-set parity) is pinned
    in tests/test_streaming.py. Oracle-checked since round 11: the
    md5-prefix bit-vote fingerprint replays in SQL (see
    operators/dedup.py::_simhash_batch), so the min-id-per-fingerprint
    survivors and their per-lang rollup value-hash exactly."""
    surv = streaming.dedup_documents_fingerprint(
        load_table(spark, sf_dir, "documents")
    )
    return surv.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


def _fingerprint_dedup_sql() -> str:
    from providenciasbigdata_spark.queries.pipeline import _SIMHASH_FPS_CTE

    return f"""
WITH {_SIMHASH_FPS_CTE},
surv AS (
  SELECT f.id AS doc_id, d.lang,
         ROW_NUMBER() OVER (PARTITION BY f.simhash ORDER BY f.id) AS rn
  FROM fps f JOIN documents d ON d.doc_id = f.id
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM surv WHERE rn = 1 GROUP BY lang
"""


WHY_NO_ORACLE: dict[str, str] = {}


QUERIES = {
    "stream_fingerprint_dedup": (q_fingerprint_dedup, _fingerprint_dedup_sql()),
    "stream_ohlc_windows": (q_ohlc_windows, _OHLC_WINDOWS_SQL),
    "stream_purchase_click_semi": (q_purchase_click_semi, _PURCHASE_CLICK_SEMI_SQL),
    "stream_session_dynamic_gap": (q_session_dynamic_gap, _SESSIONS_DYNAMIC_SQL),
    "stream_tumbling_counts": (q_tumbling, _TUMBLING_SQL),
    "stream_route_documents": (q_route_documents, _route_documents_sql()),
    "stream_enrich_segments": (q_enrich_segments, _ENRICH_SQL),
    "stream_purchase_click_join": (q_purchase_click_join, _PURCHASE_CLICK_SQL),
    "stream_purchase_click_outer": (q_purchase_click_outer, _PURCHASE_CLICK_OUTER_SQL),
    "stream_purchase_click_full_outer": (q_purchase_click_full_outer, _PURCHASE_CLICK_FULL_SQL),
    "stream_sliding_counts": (q_sliding, _SLIDING_SQL),
    "stream_session_windows": (q_sessions, _SESSIONS_SQL),
    "stream_dedup_events": (q_dedup_events, _DEDUP_EVENTS_SQL),
    "stream_user_running_totals": (q_user_running_totals, _USER_TOTALS_SQL),
}
