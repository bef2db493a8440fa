"""Structured Streaming over the ``events`` table (SURVEY.md §2.4
"Streaming" row — absent in the reference, required by the north star).

Design rule: every windowed/stateful transformation is a plain function
``DataFrame -> DataFrame`` that works IDENTICALLY on a batch frame and
a ``readStream`` frame — batch/stream parity by construction (tested in
tests/test_streaming.py by running the same function both ways with an
``availableNow`` trigger and diffing results).

Watermarks are applied only when the input is streaming (batch frames
reject ``withWatermark`` timing semantics at scale anyway: on a real
cluster the watermark bounds state, it never changes the answer for
data that arrives within the allowed lateness).

Scale notes (100 TB / unbounded stream):
- every aggregation here keys state by (window, low-cardinality key) —
  state size is O(windows x keys), independent of event volume;
- ``dropDuplicatesWithinWatermark`` state is bounded by the watermark
  horizon, the only safe exact-dedup on an unbounded stream;
- session windows merge server-side (Spark's session_window state
  store), no per-event Python;
- the stateful running aggregate uses applyInPandasWithState with
  explicit state schema + event-time timeout so abandoned keys expire.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Double sums are accumulation-order-dependent; engines (and micro-batch
# orders) disagree in the low bits and ROUND then flips a digit. Every
# value sum goes through an exact DECIMAL(28,10) accumulator — the same
# rule as queries.relational._dec_sum — in the JVM aggregates AND in the
# Python stateful processors, so batch, streaming, and the DuckDB oracle
# agree bit-for-bit.
_DEC = "decimal(28,10)"
_Q10 = Decimal("1e-10")
_Q6 = Decimal("1e-6")


def _dec_sum6(col: str):
    """Exact decimal sum -> double, 6-digit HALF_UP round."""
    return F.round(F.sum(F.col(col).cast(_DEC)).cast("double"), 6)


def _dec_add(total: Decimal, values) -> Decimal:
    """Add a pandas value column to ``total`` exactly, mirroring the JVM
    ``cast(double AS DECIMAL(28,10))`` per element: shortest-repr
    decimal parse (same contract as java.lang.Double.toString) then
    HALF_UP quantize to 10 dp."""
    import math

    for v in values:
        if v is None or pd.isna(v):
            continue
        # JVM cast(±inf AS DECIMAL) yields NULL and the sum skips it —
        # mirror that instead of letting Decimal('Infinity').quantize
        # raise InvalidOperation and kill the stream
        if not math.isfinite(float(v)):
            continue
        total += Decimal(repr(float(v))).quantize(_Q10, rounding=ROUND_HALF_UP)
    return total


def _dec_round6(total: Decimal) -> float:
    """``ROUND(CAST(total AS DOUBLE), 6)`` exactly as Spark's F.round
    computes it (decimal repr of the double, HALF_UP)."""
    return float(Decimal(repr(float(total))).quantize(_Q6, rounding=ROUND_HALF_UP))

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    (The reference has no streaming surface at all — its two pages are
    batch request/response, streamlit_app.py:109-177 — so this module's
    semantics are pinned to Spark's, not the reference's.)
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def _maybe_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if events.isStreaming and watermark:
        return events.withWatermark("ts", watermark)
    return events


# ---- windowed aggregations (batch/stream parity) ------------------------

def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.

    Output: (window_start, window_end, event_type, n_events, sum_value).
    """
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum6("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding (hopping) event-time window: each event lands in
    width/slide overlapping windows. Output as tumbling_counts, keyed
    by window only."""
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum6("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged): a session spans
    [first event, last event + gap). Spark merges overlapping gap
    windows in the session state store — no per-event Python.

    Output: (user_id, session_start, session_end, n_events).
    """
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def ohlc_windows(
    events: DataFrame, width: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Windowed OHLC bars per event_type — open/close via
    ``min_by``/``max_by`` on a composite (ts, event_id) BIGINT order
    key (same key as the batch q_ohlc_bars twin, so stream == batch
    row-for-row). All five aggregates are declarative and support
    partial aggregation, so streaming state per (window, type) is one
    constant-size buffer regardless of event volume.

    Output: (window_start, window_end, event_type, open, high, low,
    close, n).
    """
    order_key = F.unix_micros("ts") * 1000 + F.pmod("event_id", 1000)
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", order_key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", order_key), 6).alias("close"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact event dedup by event_id. Streaming: state bounded by the
    watermark horizon (dropDuplicatesWithinWatermark) — the only safe
    exact dedup on an unbounded stream. Batch: plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def purchase_then_click(
    events: DataFrame, within: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in (purchase_ts, purchase_ts + within]. Both sides
    need watermarks in streaming mode — the event-time range condition
    bounds each side's join state to the interval + watermark horizon
    (unbounded-state stream joins don't exist; the range IS the
    contract).

    Output: (user_id, purchase_id, click_id, gap_seconds).
    """
    purchases = _maybe_watermark(
        events.filter(F.col("event_type") == "purchase"), watermark
    ).select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = _maybe_watermark(
        events.filter(F.col("event_type") == "click"), watermark
    ).select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (clicks.c_ts > purchases.p_ts)
        & (clicks.c_ts <= purchases.p_ts + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("p_ts")).alias("gap_seconds"),
    )


def purchase_then_click_outer(
    events: DataFrame, within: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase appears,
    with NULL click columns when no click followed within the window.
    The outer semantics are the hard part in streaming: the NULL row
    for an unmatched purchase can only be emitted once the watermark
    passes the end of its join interval (before that a matching click
    could still arrive) — so results trail the inner join by the
    lateness bound. Batch frames produce the identical relation
    immediately.

    Output: (user_id, purchase_id, click_id nullable, gap_seconds
    nullable)."""
    purchases = _maybe_watermark(
        events.filter(F.col("event_type") == "purchase"), watermark
    ).select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = _maybe_watermark(
        events.filter(F.col("event_type") == "click"), watermark
    ).select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id)
        & (clicks.c_ts > purchases.p_ts)
        & (clicks.c_ts <= purchases.p_ts + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    )
    return joined.select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("p_ts")).alias("gap_seconds"),
    )


def purchase_with_click_semi(
    events: DataFrame, within: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """LEFT SEMI stream-stream interval join (completes the join
    matrix: inner / left outer / full outer / semi): purchases that
    were followed by AT LEAST ONE click from the same user within the
    window — each purchase once, no click columns. Unlike the outer
    variants, a semi row can stream out as soon as its FIRST match
    arrives (nothing to retract); unmatched purchases simply never
    emit, so no watermark-trailing NULL pass exists on this path.
    State stays bounded by the same interval + watermark horizon.

    Output: (user_id, purchase_id, p_ts)."""
    purchases = _maybe_watermark(
        events.filter(F.col("event_type") == "purchase"), watermark
    ).select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = _maybe_watermark(
        events.filter(F.col("event_type") == "click"), watermark
    ).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id)
        & (clicks.c_ts > purchases.p_ts)
        & (clicks.c_ts <= purchases.p_ts + F.expr(f"INTERVAL {within}")),
        "left_semi",
    )


def session_windows_dynamic(
    events: DataFrame, watermark: str | None = "2 hours"
) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (Spark's
    session_window accepts a gap EXPRESSION): purchases hold the
    session open 60 minutes, every other event 30 — the
    checkout-intent shape. Merge semantics become interval-union:
    event windows [ts, ts+gap(event)) merge while they overlap, so the
    session end is MAX(ts + gap) over its events (not last + constant
    gap). Same state-store merge machinery as the static-gap form.

    Output: (user_id, session_start, session_end, n_events,
    n_purchases)."""
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_purchases",
        )
    )


def purchase_then_click_full_outer(
    events: DataFrame, within: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """FULL OUTER stream-stream interval join (Spark 3.1+): every
    purchase AND every click appears — unmatched purchases carry NULL
    click columns, clicks that follow no purchase carry NULL purchase
    columns. Both directions of NULL emission wait for the watermark
    to close the corresponding interval; matched rows stream eagerly.
    Completes the streaming join-type matrix next to the inner and
    left-outer forms above.

    Output: (user_id, purchase_id nullable, click_id nullable,
    gap_seconds nullable), user_id coalesced across sides."""
    purchases = _maybe_watermark(
        events.filter(F.col("event_type") == "purchase"), watermark
    ).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = _maybe_watermark(
        events.filter(F.col("event_type") == "click"), watermark
    ).select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = purchases.join(
        clicks,
        (purchases.p_user_id == clicks.c_user_id)
        & (clicks.c_ts > purchases.p_ts)
        & (clicks.c_ts <= purchases.p_ts + F.expr(f"INTERVAL {within}")),
        "full_outer",
    )
    return joined.select(
        F.coalesce("p_user_id", "c_user_id").alias("user_id"),
        "purchase_id",
        "click_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("p_ts")).alias("gap_seconds"),
    )


def enrich_with_profile(events: DataFrame, profiles: DataFrame) -> DataFrame:
    """Stream-static enrichment: left-join the (possibly streaming)
    events against a STATIC profile dimension and aggregate value per
    segment. In streaming mode the static side is re-planned per
    micro-batch (so a reloaded dim table is picked up) and broadcast —
    stream-static joins need no watermark because the static side holds
    no state.

    ``profiles``: (user_id, segment). Output: per-segment event count +
    value sum ('unknown' for users outside the dim).
    """
    dim = F.broadcast(profiles.select("user_id", "segment"))
    return (
        events.join(dim, "user_id", "left")
        .withColumn("segment", F.coalesce(F.col("segment"), F.lit("unknown")))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum6("value").alias("sum_value"),
        )
    )


# ---- custom stateful operator -------------------------------------------

# total is the exact DECIMAL(28,10) running sum carried as its string
# repr (state stores have no decimal column type; a DOUBLE would re-round
# every micro-batch and drift off the batch/oracle answer).
_RUNNING_STATE_SCHEMA = "n LONG, total STRING"
_RUNNING_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def user_running_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful per-user running aggregate via
    applyInPandasWithState (SURVEY.md §2.4 streaming row): emits the
    updated (n_events, total_value) per user on every trigger.

    Batch frames take the groupBy fast path (identical output contract:
    one final row per user)."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            _dec_sum6("value").alias("total_value"),
        )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total_s = state.get if state.exists else (0, "0")
        total = Decimal(total_s)
        for pdf in pdfs:
            n += len(pdf)
            total = _dec_add(total, pdf["value"])
        state.update((n, str(total)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [_dec_round6(total)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_OUTPUT_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


_SESSION_STATE_SCHEMA = "n LONG, start_us LONG, last_us LONG"
SESSION_GAP_US = 30 * 60 * 1_000_000  # the module's 30-minute gap pin


class SessionTimeoutProcessor:
    """transformWithState processor exercising the TIMER surface: a
    per-user session accumulates (count, first, last); every input
    reschedules an event-time timer at ``last + gap``; when the timer
    fires (watermark passed the gap with no newer event) the session
    summary emits and state clears. In-stream gap splits emit eagerly
    without waiting for the timer — the same boundary-inclusive merge
    rule as ``session_windows`` (an event at exactly last+gap merges).

    Like UserTotalsProcessor, the class only touches the handle
    surface it is given, so a fake handle (with registerTimer /
    deleteTimer recording) drives the EXACT code the runtime would —
    the CI pin asserts the emitted sessions equal the batch
    ``session_windows`` result on the same events
    (tests/test_streaming.py). Timestamps ride as epoch-micros longs;
    output end = last + gap, matching the session_window contract.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("session", _SESSION_STATE_SCHEMA)
        self._handle = handle

    def _emit(self, key, n, start_us, last_us):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_us": [start_us],
                "session_end_us": [last_us + SESSION_GAP_US],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        ts_list: list[int] = []
        for pdf in rows:
            ts_list.extend(int(t) for t in pdf["ts_us"])
        ts_list.sort()
        # one RPC: get() returns None for absent state (see
        # UserTotalsProcessor.handleInputRows)
        cur = self._state.get()
        n, start_us, last_us = cur if cur is not None else (0, None, None)
        for t in ts_list:
            if last_us is not None and t - last_us > SESSION_GAP_US:
                yield self._emit(key, n, start_us, last_us)
                n, start_us = 0, None
            n += 1
            start_us = t if start_us is None else min(start_us, t)
            last_us = t if last_us is None else max(last_us, t)
        self._state.update((n, start_us, last_us))
        # one live timer per key: reschedule at the new horizon
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer((last_us + SESSION_GAP_US) // 1000)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        cur = self._state.get()  # one RPC; None == absent
        if cur is not None:
            n, start_us, last_us = cur
            if n:
                yield self._emit(key, n, start_us, last_us)
        self._state.clear()

    def close(self) -> None:
        pass


_SESSION_TWS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def session_timeouts_tws(events: DataFrame) -> DataFrame:
    """LIVE wiring for ``SessionTimeoutProcessor`` (round 6): the
    timer-based session operator through the real
    ``transformWithStateInPandas`` runtime — event-time mode, zero-
    delay watermark on ``ts``, per-user grouping. Until round 6 the
    timer path ran only through the fake-handle drive; with the
    miniproto shim (vendor/protoshim.py) the REAL runtime executes
    here: RocksDB-backed ValueState, JVM timer registry, watermark-
    driven ``handleExpiredTimer`` delivery (exercised across
    availableNow restarts in tests/test_streaming.py)."""
    from pyspark.sql.streaming import StatefulProcessor

    class _Sessions(SessionTimeoutProcessor, StatefulProcessor):
        """Processor logic + the runtime ABC (imported only here so
        module import never needs the streaming runtime)."""

    ev = events.select(
        "user_id", F.col("ts"), F.unix_micros("ts").alias("ts_us")
    ).withWatermark("ts", "0 seconds")
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Sessions(),
        outputStructType=_SESSION_TWS_OUTPUT,
        outputMode="Append",
        timeMode="EventTime",
    )


_FIRST_SEEN_STATE_SCHEMA = "hits LONG"
_FIRST_SEEN_OUTPUT_SCHEMA = "user_id LONG, n_events LONG"


class FirstSeenProcessor:
    """TTL'd first-seen gate (round 6 — the last unexercised tws state
    feature): emit a key's row only the FIRST time the key appears
    within the TTL horizon; once the state's TTL lapses, the key is
    eligible to emit again. This is the streaming-dedup shape whose
    state is bounded by WALL TIME instead of a watermark —
    ``dropDuplicatesWithinWatermark`` needs event time; a
    processing-time TTL bounds state for feeds with no usable event
    clock (Spark evaluates TTL on state READ, so expiry needs no
    timers and no extra maintenance pass).

    TTL requires ``timeMode="ProcessingTime"`` (Spark's rule — TTL is
    a processing-time concept). Logic is handle-only, so the fake
    drive tests the suppress/emit paths and the live test drives real
    RocksDB TTL expiry across availableNow restarts.
    """

    def __init__(self, ttl_ms: int) -> None:
        if ttl_ms <= 0:
            raise ValueError(f"ttl_ms must be positive, got {ttl_ms}")
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._seen = handle.getValueState(
            "seen", _FIRST_SEEN_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        for pdf in rows:
            n += len(pdf)
        if self._seen.exists():  # alive within TTL -> suppress
            return
        self._seen.update((1,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def close(self) -> None:
        pass


def first_seen_gate_tws(events: DataFrame, ttl_ms: int = 60_000) -> DataFrame:
    """LIVE wiring for ``FirstSeenProcessor`` through the real
    transformWithStateInPandas runtime (ProcessingTime mode — the only
    mode TTL is defined in)."""
    from pyspark.sql.streaming import StatefulProcessor

    class _Gate(FirstSeenProcessor, StatefulProcessor):
        """Processor logic + the runtime ABC (imported lazily)."""

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Gate(ttl_ms),
        outputStructType=_FIRST_SEEN_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


class UserTotalsProcessor:
    """The ``transformWithStateInPandas`` stateful processor behind
    ``user_running_totals_tws``, hoisted to module scope so its logic
    is CI-testable WITHOUT the protobuf state-server runtime: the
    class only touches the handle/state surface it is given, so a
    fake ValueState drives the exact code the Spark runtime would
    (tests/test_modern.py exercises both paths — live streaming where
    protobuf exists, direct-drive elsewhere).

    Subclasses StatefulProcessor lazily (init/handleInputRows/close
    match that ABC's contract) — composition keeps the import
    optional-runtime-safe.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", _RUNNING_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        # ONE state-server round trip, not two (round 14, guide §4.5 —
        # amortize the per-key boundary cost): ValueState.get() returns
        # None when the state has no value (the server answers the same
        # request either way), so the exists() probe was a second RPC
        # per key per micro-batch that carried no extra information.
        cur = self._state.get()
        n, total_s = cur if cur is not None else (0, "0")
        total = Decimal(total_s)
        for pdf in rows:
            n += len(pdf)
            total = _dec_add(total, pdf["value"])
        self._state.update((n, str(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [_dec_round6(total)],
            }
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    ``user_running_totals``: same per-user running (n_events,
    total_value) contract, expressed through the arbitrary-stateful-v2
    API (typed ValueState handle instead of the GroupState blob;
    requires the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` before start).

    At scale this is the preferred stateful surface: state lives in
    per-partition RocksDB instances with changelog checkpointing, so
    key cardinality is bounded by disk, not executor heap. Batch
    frames take the identical groupBy fast path.
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            _dec_sum6("value").alias("total_value"),
        )

    from pyspark.sql.streaming import StatefulProcessor

    class _Totals(UserTotalsProcessor, StatefulProcessor):
        """UserTotalsProcessor logic + the runtime ABC (imported only
        here so module import never needs the streaming runtime)."""

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=_RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files —
    the ingest shape of a continuously-arriving training corpus."""
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(docs_dir)


def route_documents(docs: DataFrame) -> DataFrame:
    """Streaming ingest governance router: quarantine PII docs, reject
    null/low-quality docs, accept the rest. Stateless (pure map over
    the scan) so it runs identically on batch and stream with NO state
    store and no watermark — at ingest scale this is a pass-through
    filter fused into the source read."""
    from providenciasbigdata_spark.functions.text import (
        pii_counts,
        quality_score,
        tokenize,
    )

    counts = pii_counts(F.col("text"))
    has_pii = sum(counts.values(), F.lit(0)) > 0
    quality = quality_score(F.col("text"), tokenize(F.col("text")))
    route = (
        F.when(has_pii, F.lit("quarantine"))
        .when(quality.isNull() | (quality < 0.5), F.lit("rejected"))
        .otherwise(F.lit("accepted"))
    )
    return docs.select(
        "doc_id",
        quality.alias("quality"),
        has_pii.cast("int").cast("long").alias("has_pii"),
        route.alias("route"),
    )


# ---- test/drive harness --------------------------------------------------

def run_available_now(
    transformed: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming frame to a memory sink with the availableNow
    trigger (process-everything-then-stop) and return the result as a
    batch DataFrame. Test-only sink: memory collects to the driver."""
    q = (
        transformed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return transformed.sparkSession.table(query_name)


def read_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Open a streaming query's state store as a DataFrame (Spark 4
    state data source): columns (key struct, value struct,
    partition_id). The operations surface for a 100 TB stateful job —
    inspect watermark-retained windows, audit per-key state size, or
    bootstrap a migration — without touching the running query.
    ``read_state_metadata`` lists the operators/stores a checkpoint
    holds."""
    return spark.read.format("statestore").load(checkpoint_dir)


def read_state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    return spark.read.format("state-metadata").load(checkpoint_dir)


def upsert_sink(
    stream: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str,
    query_name: str = "upsert_sink",
):
    """foreachBatch merge sink: maintain a latest-wins keyed table in
    plain parquet from a change stream — the MERGE INTO pattern without
    a transactional table format.

    Per micro-batch: union the batch with the current snapshot, keep
    the latest row per key (operators.cdc.latest_state), write a new
    snapshot directory, atomically swap it in. Exactly-once across
    restarts comes from BATCH-ID IDEMPOTENCE: the applied batch id is
    recorded with the snapshot, and a replayed batch (same id after a
    crash between write and checkpoint commit) is skipped — the
    documented foreachBatch at-least-once contract turned into
    effectively-once by making the apply idempotent.

    At scale, swap the full-snapshot rewrite for partition-scoped
    rewrites (only partitions containing the batch's keys) — the
    idempotence scheme is unchanged.
    """
    import glob
    import json
    import os
    import shutil

    from providenciasbigdata_spark.operators.cdc import latest_state

    def recover(data_dir: str) -> None:
        """Crash-window repair, run on every batch entry: a crash
        between rename(data, _old) and rename(staging, data) leaves no
        data dir and the whole prior state stranded in _old_<id> —
        restore it before merging (silently re-merging just the
        replayed batch would drop all history). Leftover _old dirs
        alongside a live data dir (crash before cleanup) and
        incomplete _staging writes are removed."""
        olds = sorted(
            glob.glob(os.path.join(target_dir, "_old_*")),
            key=lambda p: int(p.rsplit("_", 1)[1]),
        )
        if olds and not os.path.exists(data_dir):
            os.rename(olds[-1], data_dir)
            olds = olds[:-1]
        for p in olds:
            shutil.rmtree(p, ignore_errors=True)
        for p in glob.glob(os.path.join(target_dir, "_staging_*")):
            shutil.rmtree(p, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        recover(os.path.join(target_dir, "data"))
        meta_path = os.path.join(target_dir, "_applied.json")
        applied = -1
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            # batch ids are only monotonic WITHIN one checkpoint
            # lineage; a fresh checkpoint restarts at 0, and skipping
            # by a stale high-water mark would drop its new batches —
            # so the mark is scoped to the lineage and a lineage change
            # falls back to (idempotent) re-merge.
            if meta.get("lineage") == checkpoint_dir:
                applied = meta["batch_id"]
        if batch_id <= applied:
            return  # replay after crash: already merged, skip
        spark_ = batch_df.sparkSession
        data_dir = os.path.join(target_dir, "data")
        if os.path.exists(data_dir):
            merged = latest_state(
                spark_.read.parquet(data_dir).unionByName(batch_df), keys, order_cols
            )
        else:
            merged = latest_state(batch_df, keys, order_cols)
        tmp = os.path.join(target_dir, f"_staging_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(target_dir, f"_old_{batch_id}")
        if os.path.exists(data_dir):
            os.rename(data_dir, old)
        os.rename(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        with open(meta_path, "w") as fh:
            json.dump({"batch_id": batch_id, "lineage": checkpoint_dir}, fh)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now_with_progress(
    transformed: DataFrame, query_name: str, output_mode: str = "complete"
):
    """``run_available_now`` + the per-micro-batch progress records —
    the observability surface a production stream is operated by:
    state rows, watermark advance, and ``numRowsDroppedByWatermark``
    (the only evidence late data was discarded; the result table is
    silent about it). Returns (result_df, [progress dicts])."""
    q = (
        transformed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return transformed.sparkSession.table(query_name), list(q.recentProgress)


def dropped_by_watermark(progress: list) -> int:
    """Total late rows discarded across a run's micro-batches."""
    return sum(
        int(op.get("numRowsDroppedByWatermark", 0))
        for p in progress
        for op in (p.get("stateOperators") or [])
    )


def versioned_upsert_sink(
    stream: DataFrame,
    table_dir: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str,
    query_name: str = "versioned_upsert_sink",
    retain_last: int | None = None,
):
    """Time-traveling upsert sink: ``upsert_sink``'s latest-wins merge,
    but every micro-batch COMMITS A NEW VERSION through
    ``operators.snapshots`` instead of swapping one directory in
    place — the table keeps its history, ``snapshot_read(version=)``
    answers "what did this say after batch N", and
    ``cdc.snapshot_diff`` between versions is the change audit.

    Exactly-once posture matches upsert_sink: foreachBatch is
    at-least-once, so each version records (lineage, batch_id) in its
    manifest meta and a replayed batch (same lineage, id <= last
    committed) is skipped — idempotence by manifest, no separate
    sidecar file. The snapshot commit itself is atomic (manifest
    os.replace), so a crash mid-commit leaves an invisible orphan
    version dir, reclaimed by the next batch.

    Retention (verdict-r5 item 8): a long-running stream otherwise
    grows one version dir per micro-batch without bound (hundreds of
    batches = hundreds of dirs). ``retain_last=N`` runs
    ``snapshot_vacuum(keep_last=N)`` inside foreachBatch after each
    commit — safe under the sink's own single-writer contract (the
    vacuumer IS the writer, so no concurrent commit can be swept).
    Replay idempotence survives vacuuming: the (lineage, batch_id)
    high-water mark is read from the RETAINED manifest entries, and
    retained entries are always the newest. ``retain_last=None``
    keeps everything (the caller owns retention). Bounded dir count +
    time travel to the retained floor are pinned over a 50-micro-batch
    drive in tests/test_streaming.py.
    """
    from providenciasbigdata_spark.operators.cdc import latest_state
    from providenciasbigdata_spark.operators.snapshots import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_versions,
        snapshot_write,
    )

    if retain_last is not None and retain_last < 1:
        raise ValueError("retain_last must be >= 1 (or None to keep everything)")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        versions = snapshot_versions(table_dir)
        applied = -1
        for v in versions:
            meta = v.get("meta", {})
            if meta.get("lineage") == checkpoint_dir:
                applied = max(applied, meta.get("batch_id", -1))
        if batch_id <= applied:
            return  # replay within this lineage: already committed
        spark_ = batch_df.sparkSession
        if versions:
            merged = latest_state(
                snapshot_read(spark_, table_dir).unionByName(batch_df),
                keys,
                order_cols,
            )
        else:
            merged = latest_state(batch_df, keys, order_cols)
        snapshot_write(
            merged,
            table_dir,
            meta={"lineage": checkpoint_dir, "batch_id": batch_id},
        )
        if retain_last is not None:
            snapshot_vacuum(table_dir, keep_last=retain_last)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def dedup_against_index(docs: DataFrame, index: DataFrame) -> DataFrame:
    """Stream-static exact-dedup GATE (round 9): drop incoming
    documents whose normalized content fingerprint already exists in a
    STATIC index frame — the ingest shape of 'never re-admit what a
    prior crawl already holds'. Stateless on the stream side (no
    watermark, no state store): each micro-batch runs one LEFT ANTI
    equi-join against the static side, which Spark re-plans per batch
    (broadcast when the index is small; at 100 TB the index is a
    parquet table bucketed on content_hash and the join shuffles only
    the BATCH). Batch frames take the identical anti-join, so stream
    and batch agree row-for-row (pinned in tests). Null-text rows
    survive (a null fingerprint never matches — the anti-join
    contract); the oracle twin uses a LEFT JOIN ... IS NULL for the
    same null behavior."""
    from providenciasbigdata_spark.functions.text import content_fingerprint

    withh = docs.withColumn(
        "content_hash", content_fingerprint(F.col("text"))
    )
    idx = index.select("content_hash").distinct()
    return withh.join(idx, "content_hash", "left_anti")


def dedup_documents_fingerprint(docs: DataFrame) -> DataFrame:
    """Streaming FUZZY-fingerprint dedup (round 7): attach a SimHash
    fingerprint in-stream (the vectorized pandas UDF runs identically
    per micro-batch) and keep the first document per fingerprint —
    near-identical token sets collide on the 64-bit bit-majority
    signature, so re-crawled/re-posted copies drop at INGEST, before
    they ever reach the corpus (the offline near-dup pass then only
    sees genuinely new text).

    Streams: ``dropDuplicatesWithinWatermark`` on the fingerprint with
    a processing-time watermark — state is bounded by the horizon, the
    only safe infinite-stream contract (an unbounded fingerprint set
    is the batch tool's job). First-arrival winner is micro-batch-
    order-dependent, so cross-mode parity is on the FINGERPRINT SET,
    not the surviving doc ids (pinned in tests/test_streaming.py).
    Batch twin: deterministic first = min doc_id per fingerprint.
    """
    from providenciasbigdata_spark.operators.dedup import simhash_udf

    with_fp = docs.withColumn("simhash", simhash_udf()(F.col("text")))
    if docs.isStreaming:
        return (
            with_fp.withColumn("ingest_ts", F.current_timestamp())
            .withWatermark("ingest_ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["simhash"])
            .drop("ingest_ts")
        )
    d = F.min_by(
        F.struct(*[F.col(c) for c in with_fp.columns]), F.col("doc_id")
    ).alias("d")
    return with_fp.groupBy("simhash").agg(d).select("d.*")
