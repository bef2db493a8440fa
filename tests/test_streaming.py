"""Structured Streaming: batch/stream parity via availableNow trigger.

The events fixture's ts column is Parquet NANOS (io.load_table rebuilds
micros); for the file-source stream we re-write a micros-typed copy to
a tmp dir once per session and stream from there.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from providenciasbigdata_spark import streaming
from providenciasbigdata_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF, "events").coalesce(2).write.mode("overwrite").parquet(path)
    return path


def _as_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "fn,cols,output_mode",
    [
        (
            streaming.tumbling_counts,
            ["window_start", "window_end", "event_type", "n_events", "sum_value"],
            "complete",
        ),
        (
            streaming.sliding_counts,
            ["window_start", "window_end", "n_events", "sum_value"],
            "complete",
        ),
        (
            streaming.session_windows,
            ["user_id", "session_start", "session_end", "n_events"],
            "complete",
        ),
        (
            streaming.ohlc_windows,
            ["window_start", "window_end", "event_type", "open", "high", "low", "close", "n"],
            "complete",
        ),
        (
            streaming.session_windows_dynamic,
            ["user_id", "session_start", "session_end", "n_events", "n_purchases"],
            "complete",
        ),
    ],
)
def test_stream_matches_batch(spark, events_dir, fn, cols, output_mode):
    batch = fn(load_table(spark, SF, "events"))
    stream = fn(streaming.events_stream(spark, events_dir))
    assert stream.isStreaming
    name = f"t_{fn.__name__}"
    got = streaming.run_available_now(stream, name, output_mode=output_mode)
    assert _as_rows(got, cols) == _as_rows(batch, cols)


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast join: streaming events x static profile
    dim produces the batch answer (no watermark needed — static side
    holds no state)."""
    profiles = (
        load_table(spark, SF, "customer")
        .selectExpr("c_custkey AS user_id", "c_mktsegment AS segment")
    )
    cols = ["segment", "n_events", "sum_value"]
    batch = streaming.enrich_with_profile(load_table(spark, SF, "events"), profiles)
    stream = streaming.enrich_with_profile(
        streaming.events_stream(spark, events_dir), profiles
    )
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_enrich", output_mode="complete")
    assert _as_rows(got, cols) == _as_rows(batch, cols)


def test_dedup_events_stream_drops_resent_ids(spark, events_dir):
    stream = streaming.dedup_events(streaming.events_stream(spark, events_dir))
    got = streaming.run_available_now(stream, "t_dedup", output_mode="append")
    batch_n = load_table(spark, SF, "events").dropDuplicates(["event_id"]).count()
    assert got.count() == batch_n


def test_user_running_totals_stateful(spark, events_dir):
    stream = streaming.user_running_totals(streaming.events_stream(spark, events_dir))
    got = streaming.run_available_now(stream, "t_running", output_mode="update")
    # update mode may emit one row per user per trigger; the LAST row per
    # user must equal the batch aggregate.
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    final = (
        got.withColumn("rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("n_events"))))
        .filter("rn = 1").drop("rn")
    )
    batch = streaming.user_running_totals(load_table(spark, SF, "events"))
    cols = ["user_id", "n_events", "total_value"]
    assert _as_rows(final, cols) == _as_rows(batch, cols)


def test_stream_stream_semi_join_matches_batch(spark, events_dir):
    """LEFT SEMI stream-stream join: converted purchases stream out
    once each; the availableNow drain equals the batch relation."""
    batch = streaming.purchase_with_click_semi(load_table(spark, SF, "events"))
    stream = streaming.purchase_with_click_semi(
        streaming.events_stream(spark, events_dir)
    )
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_ssjoin_semi", output_mode="append")
    cols = ["user_id", "purchase_id", "p_ts"]
    assert _as_rows(got, cols) == _as_rows(batch, cols)
    # semi = distinct purchases of the inner join, and each appears once
    inner = streaming.purchase_then_click(load_table(spark, SF, "events"))
    assert got.count() == inner.select("purchase_id").distinct().count()
    assert got.count() == got.select("purchase_id").distinct().count()


def test_stream_stream_join_matches_batch(spark, events_dir):
    batch = streaming.purchase_then_click(load_table(spark, SF, "events"))
    stream = streaming.purchase_then_click(streaming.events_stream(spark, events_dir))
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_ssjoin", output_mode="append")
    cols = ["user_id", "purchase_id", "click_id", "gap_seconds"]
    assert _as_rows(got, cols) == _as_rows(batch, cols)


def test_watermark_drops_late_data_across_batches(spark, tmp_path_factory):
    """Micro-batches via maxFilesPerTrigger=1. Batch 1 advances the
    watermark past the 10:00 window; batch 2 keeps it there (and the
    closed window's state is evicted + emitted); batch 3 delivers a
    10:30 event — now behind the watermark WITH its state gone, the
    case Spark guarantees dropping. (A late row arriving while the
    window state still lingers may legally be merged: the watermark
    contract bounds state retention, it does not promise eager drops.)"""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("late_events")

    def write_file(name, ts_list, mtime):
        n = len(ts_list)
        table = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts_list, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array([None] * n, pa.string()),
            }
        )
        path = str(d / name)
        pq.write_table(table, path)
        os.utime(path, (mtime, mtime))
        return path

    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    # batch 1: two 10:xx events + a 12:00 event -> watermark 11:50
    write_file("b1.parquet", [t, t + dt.timedelta(minutes=5), t.replace(hour=12)], 1000)
    # batch 2: 12:30 -> the 10:00 window (end 11:00 < 11:50) closes:
    # state evicted, append-mode row emitted with n_events=2
    write_file("b2.parquet", [t.replace(hour=12, minute=30)], 2000)
    # batch 3: a LATE 10:30 event — behind the watermark, state gone
    write_file("b3.parquet", [t + dt.timedelta(minutes=30)], 3000)

    stream = streaming.tumbling_counts(
        streaming.events_stream(spark, str(d), max_files_per_trigger=1),
        width="1 hour",
        watermark="10 minutes",
    )
    got = streaming.run_available_now(stream, "t_late", output_mode="append")
    rows = {r.window_start.hour: r.n_events for r in got.collect()}
    # only the 10:00 window closed; its count excludes the late event
    assert rows == {10: 2}, rows


def test_checkpoint_restart_no_reprocessing(spark, tmp_path_factory):
    """Exactly-once file sink across a restart: stop the query, add
    new input, restart with the SAME checkpoint — the sink must hold
    each input row exactly once (offsets resume, no dupes)."""
    import pyspark.sql.functions as F

    src = tmp_path_factory.mktemp("ckpt_src")
    sink = str(tmp_path_factory.mktemp("ckpt_sink"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_state"))

    events = load_table(spark, SF, "events")
    events.filter(F.col("event_id") < 100).write.mode("overwrite").parquet(
        str(src / "f1")
    )

    def run_once():
        q = (
            streaming.events_stream(spark, str(src) + "/*")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 100
    events.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 150)
    ).write.mode("overwrite").parquet(str(src / "f2"))
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 150  # 100 original + 50 new, nothing twice
    assert got.select("event_id").distinct().count() == 150


def test_session_window_gap_boundary(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "a", 1.0, None),
        # exactly gap after the previous event -> MERGES (Spark session
        # windows are boundary-inclusive; the oracle SQL's `>` depends
        # on this pin)
        (2, base + dt.timedelta(minutes=30), 1, "a", 1.0, None),
        # one microsecond past the gap -> NEW session
        (3, base + dt.timedelta(minutes=60, microseconds=1), 1, "a", 1.0, None),
    ]
    df = spark.createDataFrame(rows, schema=streaming.EVENTS_SCHEMA)
    out = streaming.session_windows(df, gap="30 minutes").collect()
    assert sorted(r.n_events for r in out) == [1, 2]


def test_route_documents_stream_matches_batch(spark, tmp_path_factory):
    """Governance router parity: same rows whether documents arrive as
    a batch table or as a file stream (stateless map, append mode)."""
    import shutil

    src = "/root/testdata/sf0.001/documents.parquet"
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(src, d / "part-0.parquet")
    batch = streaming.route_documents(
        spark.read.schema(streaming.DOCUMENTS_SCHEMA).parquet(str(d))
    )
    stream = streaming.route_documents(streaming.documents_stream(spark, str(d)))
    got = streaming.run_available_now(stream, "t_route", output_mode="append")
    want = sorted(map(tuple, batch.collect()))
    assert sorted(map(tuple, got.collect())) == want and len(want) > 0


def test_stream_stream_outer_join_matches_batch(spark, events_dir):
    """LEFT OUTER interval join: matched rows must equal the batch
    relation exactly. NULL (unmatched) rows can only be emitted once
    the watermark passes each purchase's interval end, and Spark does
    not advance the watermark past the data at stream end — so the
    streamed NULL rows are a subset of the batch NULL rows, restricted
    to purchases whose interval closed under the final watermark."""
    batch = streaming.purchase_then_click_outer(load_table(spark, SF, "events"))
    stream = streaming.purchase_then_click_outer(
        streaming.events_stream(spark, events_dir)
    )
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_ssjoin_outer", output_mode="append")
    cols = ["user_id", "purchase_id", "click_id", "gap_seconds"]
    got_matched = _as_rows(got.filter("click_id IS NOT NULL"), cols)
    batch_matched = _as_rows(batch.filter("click_id IS NOT NULL"), cols)
    assert got_matched == batch_matched
    got_null = set(_as_rows(got.filter("click_id IS NULL"), cols))
    batch_null = set(_as_rows(batch.filter("click_id IS NULL"), cols))
    assert got_null <= batch_null
    # and the watermark DID close most intervals (1h lateness on a
    # multi-day fixture): expect the vast majority of null rows emitted
    assert len(got_null) >= 0.8 * len(batch_null), (len(got_null), len(batch_null))


def test_state_store_reader_exposes_window_state(spark, events_dir, tmp_path_factory):
    """Run a checkpointed windowed aggregation, then read its state
    store back as a DataFrame: every (window, event_type) group the
    query output must exist in state with the same count."""
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    out = streaming.tumbling_counts(streaming.events_stream(spark, events_dir),
                                    width="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_state_probe")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table("t_state_probe")

    from pyspark.sql import functions as F

    meta = streaming.read_state_metadata(spark, ckpt)
    assert meta.filter("operatorName = 'stateStoreSave'").count() == 1

    state = streaming.read_state(spark, ckpt)
    # state rows hold the raw aggregation BUFFERS (count, sum), keyed by
    # the grouping struct — projection aliases only exist downstream
    flat = state.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n_events"),
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in flat.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in result.collect()
    }
    assert got == want and got


def test_upsert_sink_maintains_latest_state_and_is_idempotent(
    spark, events_dir, tmp_path_factory
):
    """foreachBatch merge sink: after draining the stream (one file per
    micro-batch), the parquet target holds exactly the latest row per
    user; re-running the whole stream against a FRESH checkpoint but
    the SAME target must not change the result (batch-id idempotence
    makes replays no-ops only within one checkpoint lineage — the
    second run re-merges, which must also be a no-op because merge is
    idempotent on content)."""
    import os

    from pyspark.sql import functions as F

    target = str(tmp_path_factory.mktemp("upsert_target"))
    ckpt = str(tmp_path_factory.mktemp("upsert_ckpt"))
    stream = streaming.events_stream(spark, events_dir, max_files_per_trigger=1)
    q = streaming.upsert_sink(
        stream, target, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt, query_name="t_upsert",
    )
    q.awaitTermination()

    got = spark.read.parquet(os.path.join(target, "data"))
    want = (
        load_table(spark, SF, "events")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    assert got.count() == want.count()
    key = ["user_id", "event_id"]
    assert got.select(key).exceptAll(want.select(key)).count() == 0

    # second full replay, fresh checkpoint, same target: content-idempotent
    ckpt2 = str(tmp_path_factory.mktemp("upsert_ckpt2"))
    q2 = streaming.upsert_sink(
        streaming.events_stream(spark, events_dir, max_files_per_trigger=1),
        target, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt2, query_name="t_upsert2",
    )
    q2.awaitTermination()
    again = spark.read.parquet(os.path.join(target, "data"))
    assert again.count() == want.count()
    assert again.select(key).exceptAll(want.select(key)).count() == 0


def test_upsert_sink_recovers_crash_window(spark, events_dir, tmp_path_factory):
    """Crash between the two snapshot renames leaves no data dir and
    the whole prior state stranded in _old_<id>; the sink must restore
    it on the next batch entry instead of silently restarting from the
    replayed batch alone (ADVICE r2)."""
    import os
    import shutil

    target = str(tmp_path_factory.mktemp("upsert_crash_target"))
    ckpt = str(tmp_path_factory.mktemp("upsert_crash_ckpt"))
    q = streaming.upsert_sink(
        streaming.events_stream(spark, events_dir),
        target, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt, query_name="t_upsert_crash",
    )
    q.awaitTermination()
    data = os.path.join(target, "data")
    want = spark.read.parquet(data).count()
    assert want > 0

    # simulate the crash window: data renamed away, staging leftover,
    # meta stale (points at the pre-crash batch of another lineage)
    os.rename(data, os.path.join(target, "_old_99"))
    os.makedirs(os.path.join(target, "_staging_100"))

    ckpt2 = str(tmp_path_factory.mktemp("upsert_crash_ckpt2"))
    q2 = streaming.upsert_sink(
        streaming.events_stream(spark, events_dir),
        target, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt2, query_name="t_upsert_crash2",
    )
    q2.awaitTermination()
    got = spark.read.parquet(data)
    assert got.count() == want  # prior state restored, merge idempotent
    leftovers = [p for p in os.listdir(target) if p.startswith(("_old_", "_staging_"))]
    assert leftovers == []


def test_dec_add_skips_non_finite_like_jvm_cast():
    """cast(double AS DECIMAL) nulls ±inf on the JVM; the stateful
    processors' exact-decimal accumulator must mirror that instead of
    raising InvalidOperation mid-stream."""
    from decimal import Decimal

    total = streaming._dec_add(
        Decimal(0), [1.5, float("inf"), float("-inf"), float("nan"), None, 2.5]
    )
    assert total == Decimal("4.0")


def test_streaming_observed_quality_metrics(spark, events_dir):
    """observe_expectations on a STREAMING frame: the violation
    counters surface per micro-batch in StreamingQueryProgress
    .observedMetrics — free in-flight data-quality monitoring (no
    second pass, no extra query), summing to the batch audit."""
    from providenciasbigdata_spark.operators import quality as q

    checks = [q.not_null("event_id"), q.min_value("value", 0.0)]
    stream = streaming.events_stream(spark, events_dir, max_files_per_trigger=1)
    observed, _obs = q.observe_expectations(stream, checks, name="stream_quality")
    query = (
        observed.writeStream.format("noop")
        .queryName("observed_quality")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    totals = {c.name: 0 for c in checks}
    n_with_metrics = 0
    for p in query.recentProgress:
        m = p.observedMetrics.get("stream_quality")
        if m is not None:
            n_with_metrics += 1
            for c in checks:
                totals[c.name] += m[c.name]
    assert n_with_metrics >= 1  # at least one reporting micro-batch
    batch = load_table(spark, SF, "events")
    want = {r.check: r.violations for r in q.validate_expectations(batch, checks).collect()}
    assert totals == want


def test_stream_stream_full_outer_join_matches_batch(spark, events_dir):
    """FULL OUTER interval join: matched rows equal the batch relation;
    BOTH null directions (unmatched purchases AND orphan clicks) are
    watermark-gated subsets of the batch nulls, with most intervals
    closed on the multi-day fixture."""
    batch = streaming.purchase_then_click_full_outer(load_table(spark, SF, "events"))
    stream = streaming.purchase_then_click_full_outer(
        streaming.events_stream(spark, events_dir)
    )
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_ssjoin_full", output_mode="append")
    cols = ["user_id", "purchase_id", "click_id", "gap_seconds"]
    got_m = _as_rows(got.filter("click_id IS NOT NULL AND purchase_id IS NOT NULL"), cols)
    batch_m = _as_rows(batch.filter("click_id IS NOT NULL AND purchase_id IS NOT NULL"), cols)
    assert got_m == batch_m
    for null_side in ("click_id IS NULL", "purchase_id IS NULL"):
        got_n = set(_as_rows(got.filter(null_side), cols))
        batch_n = set(_as_rows(batch.filter(null_side), cols))
        assert got_n <= batch_n
        assert len(got_n) >= 0.5 * len(batch_n), (null_side, len(got_n), len(batch_n))


def test_watermark_late_drop_is_observable(spark, tmp_path):
    """Late-data accounting across a RESTART: a file arriving entirely
    behind the checkpoint-restored watermark is dropped by
    dropDuplicatesWithinWatermark and the drop is visible in
    numRowsDroppedByWatermark — the operational evidence the sink
    itself never shows. Empirical pin recorded here: WITHIN one
    availableNow run the watermark starts at the run's initial value
    and does NOT filter later micro-batches (measured: update-mode agg,
    append-mode agg, dropDuplicates, and dropDuplicatesWithinWatermark
    all admit a second-batch late file in-run — drops fire only once
    the watermark is restored from the checkpoint on the next run)."""
    from providenciasbigdata_spark.streaming import dropped_by_watermark

    src = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    recent = spark.createDataFrame(
        [(i, f"2024-01-02 1{i % 10}:00:00") for i in range(20)],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    late = spark.createDataFrame(
        [(100 + i, "2024-01-01 00:00:00") for i in range(5)],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    recent.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(src)
        dd = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            dd.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return list(q.recentProgress)

    p1 = run()
    assert dropped_by_watermark(p1) == 0
    late.coalesce(1).write.mode("append").parquet(src)
    p2 = run()
    assert dropped_by_watermark(p2) == 5
    # the late rows never reached the sink
    got = spark.read.parquet(sink)
    assert got.count() == 20
    assert got.filter(F.col("ts") < "2024-01-02").count() == 0


class _TimerFakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _TimerFakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _TimerFakeValueState())

    def registerTimer(self, ms):
        self.timers.append(ms)

    def deleteTimer(self, ms):
        self.timers.remove(ms)

    def listTimers(self):
        return list(self.timers)


def test_session_timeout_processor_live_timers(spark, tmp_path_factory):
    """The timer processor through the REAL transformWithStateInPandas
    runtime (miniproto shim, verdict-r5 item 5): three availableNow
    runs over one checkpoint drive live event-time TIMER delivery —
    run 1 ingests the real events (in-stream gap splits emit, horizons
    registered in the JVM timer registry), runs 2-3 feed only a far-
    future sentinel user, so the watermark sweeps past every real
    horizon and ``handleExpiredTimer`` must emit the tail sessions.
    Union of the three runs' emissions == the batch session_windows
    relation for the real users, exactly."""
    from providenciasbigdata_spark.queries.modern import has_tws_runtime

    assert has_tws_runtime()  # real protobuf or the miniproto shim
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spool = str(tmp_path_factory.mktemp("tws_timer_spool"))
    ckpt = str(tmp_path_factory.mktemp("tws_timer_ckpt"))
    try:
        ev = load_table(spark, SF, "events").filter(F.col("user_id") < 12)
        ev.coalesce(1).write.mode("append").parquet(spool)
        max_ts = ev.agg(F.max("ts")).first()[0]

        want = {
            (r[0], r[1], r[2], r[3])
            for r in streaming.session_windows(ev, watermark=None)
            .select(
                "user_id",
                F.unix_micros("session_start"),
                F.unix_micros("session_end"),
                "n_events",
            )
            .collect()
        }

        out_dir = str(tmp_path_factory.mktemp("tws_timer_out"))

        def drain(name):
            # memory sink cannot RESUME from a checkpoint; a foreachBatch
            # parquet append can — required for the 3-run restart design
            stream = streaming.events_stream(spark, spool)
            q = (
                streaming.session_timeouts_tws(stream)
                .writeStream.foreachBatch(
                    lambda df, _bid: df.write.mode("append").parquet(out_dir)
                )
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
                for r in spark.read.schema(
                    "user_id long, session_start_us long, "
                    "session_end_us long, n_events long"
                ).parquet(out_dir).collect()
            }

        got = drain("tws_timer_r1")
        assert got < want  # gap splits emit some, tail sessions pending

        # sentinel batches: a dummy user far in the future advances the
        # watermark; real users receive NO input, so only their TIMERS
        # can emit the remaining sessions
        import datetime as dt

        for i, name in enumerate(("tws_timer_r2", "tws_timer_r3")):
            sent = spark.createDataFrame(
                [(9_999_990 + i, max_ts + dt.timedelta(days=30 + i),
                  9_999_990, "sentinel", 0.0, "{}")],
                schema=ev.schema,
            )
            sent.coalesce(1).write.mode("append").parquet(spool)
            got |= drain(name)

        real = {r for r in got if r[0] < 12}
        assert real == want
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_session_timeout_processor_matches_batch_sessions(spark):
    """The TIMER-based stateful-v2 session processor, driven through a
    fake handle (registerTimer/deleteTimer recorded, expiry simulated
    at end of stream — availableNow never advances the watermark past
    the final events, so the timer path is OUR logic to pin): emitted
    sessions must equal the batch session_windows relation exactly,
    including in-stream gap splits ACROSS micro-batch boundaries."""
    import pandas as pd

    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 30)
    want = {
        (r[0], r[1], r[2], r[3])
        for r in streaming.session_windows(ev, watermark=None)
        .select(
            "user_id",
            F.unix_micros("session_start"),
            F.unix_micros("session_end"),
            "n_events",
        )
        .collect()
    }

    rows = (
        ev.select("user_id", F.unix_micros("ts").alias("ts_us"))
        .toPandas()
        .sort_values(["user_id", "ts_us"])
    )
    got = set()
    for uid, g in rows.groupby("user_id"):
        proc = streaming.SessionTimeoutProcessor()
        handle = _TimerFakeHandle()
        proc.init(handle)
        # three micro-batches per user: sessions must survive batch
        # boundaries and split only on real gaps
        chunks = [g.iloc[i::3].sort_values("ts_us") for i in range(3)]
        # feed in time order: interleave back into sorted thirds
        ordered = g.sort_values("ts_us")
        n = len(ordered)
        chunks = [ordered.iloc[: n // 3], ordered.iloc[n // 3 : 2 * n // 3],
                  ordered.iloc[2 * n // 3 :]]
        for ch in chunks:
            if len(ch) == 0:
                continue
            for out in proc.handleInputRows((uid,), [ch], None):
                got.update(map(tuple, out.itertuples(index=False)))
        assert len(handle.timers) == 1  # exactly one live timer per key
        for out in proc.handleExpiredTimer((uid,), None, None):
            got.update(map(tuple, out.itertuples(index=False)))
        # after expiry the state is cleared: a second fire emits nothing
        assert list(proc.handleExpiredTimer((uid,), None, None)) == []

    want_shaped = {(u, s, e, n) for u, s, e, n in want}
    got_shaped = {(u, s, e, n) for u, s, e, n in got}
    assert got_shaped == want_shaped


def test_versioned_sink_retention_50_batches(spark, tmp_path_factory):
    """verdict-r5 item 8: a LONG-RUNNING stream (50 micro-batches, one
    file each) with periodic vacuum inside foreachBatch. Pins: the
    version-dir count stays bounded at retain_last (never one dir per
    batch), time travel works exactly down to the retained floor and
    raises below it, and a same-lineage replay after vacuuming commits
    nothing (the batch high-water mark survives retention)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from providenciasbigdata_spark.operators.snapshots import (
        snapshot_read,
        snapshot_versions,
    )

    n_batches, retain = 50, 5
    spool = str(tmp_path_factory.mktemp("ret_spool"))
    table = str(tmp_path_factory.mktemp("ret_table"))
    ckpt = str(tmp_path_factory.mktemp("ret_ckpt"))
    base = time.time() - n_batches - 10
    for i in range(n_batches):
        path = os.path.join(spool, f"f{i:03d}.parquet")
        pq.write_table(
            pa.table({"k": pa.array([i % 7], pa.int64()),
                      "v": pa.array([i], pa.int64())}),
            path,
        )
        os.utime(path, (base + i, base + i))  # strict mtime order = batch order

    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    q = streaming.versioned_upsert_sink(
        stream, table, keys=["k"], order_cols=["v"],
        checkpoint_dir=ckpt, query_name="t_retention", retain_last=retain,
    )
    q.awaitTermination()

    versions = snapshot_versions(table)
    assert len(versions) == retain
    batch_ids = [v["meta"]["batch_id"] for v in versions]
    assert batch_ids == list(range(n_batches - retain, n_batches))
    # bounded on-disk footprint: exactly the retained version dirs
    vdirs = [d for d in os.listdir(table) if d.startswith("v") and
             os.path.isdir(os.path.join(table, d))]
    assert len(vdirs) == retain, sorted(vdirs)

    def expected_state(up_to_batch):
        # state after batch b = latest v per key over rows 0..b
        st = {}
        for i in range(up_to_batch + 1):
            st[i % 7] = i
        return st

    # latest == full-history upsert state despite 45 vacuumed versions
    latest = {r.k: r.v for r in snapshot_read(spark, table).collect()}
    assert latest == expected_state(n_batches - 1)

    # time travel to the retained FLOOR version is exact...
    floor = versions[0]["version"]
    floor_batch = versions[0]["meta"]["batch_id"]
    at_floor = {r.k: r.v for r in snapshot_read(spark, table, version=floor).collect()}
    assert at_floor == expected_state(floor_batch)
    # ...and below the floor raises with the available range
    with pytest.raises(ValueError, match="available"):
        snapshot_read(spark, table, version=floor - 1)

    # same-lineage replay: high-water mark survived vacuuming
    q2 = streaming.versioned_upsert_sink(
        stream, table, keys=["k"], order_cols=["v"],
        checkpoint_dir=ckpt, query_name="t_retention2", retain_last=retain,
    )
    q2.awaitTermination()
    assert len(snapshot_versions(table)) == retain
    assert [v["meta"]["batch_id"] for v in snapshot_versions(table)] == batch_ids

    with pytest.raises(ValueError, match="retain_last"):
        streaming.versioned_upsert_sink(
            stream, table, keys=["k"], order_cols=["v"],
            checkpoint_dir=ckpt, retain_last=0,
        )


def test_versioned_upsert_sink_time_travel(spark, events_dir, tmp_path_factory):
    """Every micro-batch commits a snapshot VERSION: version count ==
    micro-batch count, the latest version equals the batch twin
    (latest row per user over all data), an early version equals the
    batch twin over its own prefix of the spool, and a full replay
    against the same lineage commits nothing new."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from providenciasbigdata_spark.operators.snapshots import (
        snapshot_read,
        snapshot_versions,
    )

    table = str(tmp_path_factory.mktemp("vsink_table"))
    ckpt = str(tmp_path_factory.mktemp("vsink_ckpt"))
    # dedicated spool with one file per third of the data (the shared
    # events_dir fixture may collapse to a single file at this SF)
    spool = str(tmp_path_factory.mktemp("vsink_spool"))
    allev0 = load_table(spark, SF, "events")
    for i in range(3):
        allev0.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(spool)
    events_dir = spool
    stream = streaming.events_stream(spark, events_dir, max_files_per_trigger=1)
    q = streaming.versioned_upsert_sink(
        stream, table, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt, query_name="t_vupsert",
    )
    q.awaitTermination()

    versions = snapshot_versions(table)
    n_files = len([f for f in os.listdir(events_dir) if f.endswith(".parquet")])
    assert len(versions) == n_files >= 2
    assert [v["meta"]["batch_id"] for v in versions] == list(range(n_files))

    def batch_twin(df):
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    allev = load_table(spark, SF, "events")
    latest = snapshot_read(spark, table)
    want = batch_twin(allev)
    assert latest.count() == want.count()
    key = ["user_id", "event_id"]
    assert latest.select(key).exceptAll(want.select(key)).count() == 0

    # time travel: version 1 == the twin over the FIRST spool file
    first_file = min(
        (f for f in os.listdir(events_dir) if f.endswith(".parquet")),
        key=lambda f: os.path.getmtime(os.path.join(events_dir, f)),
    )  # the file source processes oldest-mtime first
    prefix = spark.read.parquet(os.path.join(events_dir, first_file))
    v1 = snapshot_read(spark, table, version=1)
    w1 = batch_twin(prefix)
    assert v1.count() == w1.count()
    assert v1.select(key).exceptAll(w1.select(key)).count() == 0

    # replay, same lineage: batch ids already committed -> no new versions
    q2 = streaming.versioned_upsert_sink(
        stream, table, keys=["user_id"], order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt, query_name="t_vupsert2",
    )
    q2.awaitTermination()
    assert len(snapshot_versions(table)) == n_files


def test_batch_session_window_boundary_rule(spark):
    """Native session_window in BATCH mode: an event at EXACTLY
    last+gap merges (one session) — the same rule the streaming parity
    pinned and the sessionize() islands oracle encodes with '>'."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 30, 0), 2.0),   # exactly +gap
        (1, dt.datetime(2024, 1, 1, 1, 0, 1), 3.0),    # gap+1s -> new
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = (
        df.groupBy(F.session_window("ts", "1800 seconds").alias("w"), "user_id")
        .count()
        .orderBy("w.start")
        .collect()
    )
    assert [r["count"] for r in out] == [2, 1]
    assert out[0].w.end == dt.datetime(2024, 1, 1, 1, 0, 0)  # last+gap


class _TTLFakeHandle(_TimerFakeHandle):
    def __init__(self):
        super().__init__()
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return super().getValueState(name, schema)


def test_first_seen_gate_logic_fake_drive():
    """FirstSeenProcessor logic through a fake handle: first batch
    emits, second suppresses while state exists; TTL forwarded to the
    state registration; non-positive TTL raises."""
    import pandas as pd
    import pytest

    from providenciasbigdata_spark.streaming import FirstSeenProcessor

    with pytest.raises(ValueError):
        FirstSeenProcessor(0)

    p = FirstSeenProcessor(5_000)
    h = _TTLFakeHandle()
    p.init(h)
    assert h.ttls["seen"] == 5_000
    batch = [pd.DataFrame({"value": [1.0, 2.0]})]
    out = list(p.handleInputRows((7,), batch, None))
    assert len(out) == 1 and out[0].user_id[0] == 7 and out[0].n_events[0] == 2
    assert list(p.handleInputRows((7,), batch, None)) == []  # suppressed
    h.states["seen"].clear()  # what TTL expiry looks like to the logic
    assert len(list(p.handleInputRows((7,), batch, None))) == 1


def test_first_seen_gate_ttl_live(spark, tmp_path_factory):
    """State TTL through the REAL tws runtime (the last unexercised
    tws feature): within the TTL a replayed key is suppressed by live
    RocksDB state; after the TTL lapses (wall clock — ProcessingTime
    mode) the key emits again.

    Drive design (measured constraint): tws in ProcessingTime mode
    never goes idle — after data drains it keeps scheduling "No new
    data but cleaning up state" micro-batches indefinitely, so
    availableNow never terminates and processAllAvailable never
    returns on this build. The test therefore runs ONE continuous
    query per scenario, polls the checkpoint's commit log for the
    expected batch count, then stops the query explicitly.
    """
    import time as _time

    from providenciasbigdata_spark.queries.modern import has_tws_runtime

    assert has_tws_runtime()
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)

        def drive(ttl_ms, tag, sleep_between):
            spool = str(tmp_path_factory.mktemp(f"ttl_spool_{tag}"))
            ckpt = str(tmp_path_factory.mktemp(f"ttl_ckpt_{tag}"))
            out = str(tmp_path_factory.mktemp(f"ttl_out_{tag}")) + "/o"
            ev.coalesce(1).write.mode("append").parquet(spool)

            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(spool)
            )
            q = (
                streaming.first_seen_gate_tws(stream, ttl_ms=ttl_ms)
                .writeStream.foreachBatch(
                    lambda df, _b: df.write.mode("append").parquet(out)
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )

            def wait_input_rows(n, timeout=150):
                # commit count lies here: ProcessingTime tws inserts
                # EMPTY cleanup batches between data batches, so the
                # proof a file was CONSUMED is cumulative numInputRows
                deadline = _time.time() + timeout
                while _time.time() < deadline:
                    seen = sum(p["numInputRows"] for p in q.recentProgress)
                    if seen >= n:
                        return True
                    _time.sleep(1)
                return False

            per_file = ev.count()
            try:
                assert wait_input_rows(per_file), "first file never consumed"
                if sleep_between:
                    _time.sleep(sleep_between)
                ev.coalesce(1).write.mode("append").parquet(spool)
                assert wait_input_rows(2 * per_file), "second file never consumed"
                # the emission for the consumed batch lands via
                # foreachBatch BEFORE its progress event; one grace
                # poll protects against fs listing lag anyway
                _time.sleep(2)
            finally:
                q.stop()
            return (
                spark.read.schema("user_id long, n_events long")
                .parquet(out)
                .count()
            )

        # alive TTL: replayed keys suppressed -> still 5 rows
        assert drive(600_000, "sup", 0) == 5
        # lapsed TTL: 6s sleep >> 2s TTL -> every key re-emits -> 10
        assert drive(2_000, "exp", 6) == 10
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_fingerprint_dedup_stream_matches_batch(spark, tmp_path_factory):
    """Round 7 fuzzy-fingerprint ingest dedup: the streamed drain keeps
    exactly ONE doc per SimHash fingerprint, and the surviving
    FINGERPRINT SET equals the batch twin's (first-arrival winners are
    micro-batch-order-dependent, so ids are not compared); planted
    near-identical docs collapse to one survivor."""
    import shutil

    src = "/root/testdata/sf0.001/documents.parquet"
    d = tmp_path_factory.mktemp("docs_fp_stream")
    shutil.copy(src, d / "part-0.parquet")
    batch_docs = spark.read.schema(streaming.DOCUMENTS_SCHEMA).parquet(str(d))
    batch = streaming.dedup_documents_fingerprint(batch_docs)
    stream = streaming.dedup_documents_fingerprint(
        streaming.documents_stream(spark, str(d))
    )
    assert stream.isStreaming
    got = streaming.run_available_now(stream, "t_fp_dedup", output_mode="append")
    want_fps = sorted(r.simhash for r in batch.select("simhash").collect())
    got_fps = sorted(r.simhash for r in got.select("simhash").collect())
    assert got_fps == want_fps and len(got_fps) > 0
    # exactly one survivor per fingerprint, and no more survivors than docs
    assert len(set(got_fps)) == len(got_fps) <= batch_docs.count()
    # planted near-identicals: same token SET -> same fingerprint -> one row
    extra = spark.createDataFrame(
        [(900001, "merge sort table window", "en", "web", 23),
         (900002, "window table merge sort sort merge", "en", "web", 35)],
        schema=streaming.DOCUMENTS_SCHEMA,
    )
    planted = streaming.dedup_documents_fingerprint(extra)
    assert planted.count() == 1


def test_dedup_against_index_stream_equals_batch(spark, tmp_path):
    """Round 9 stream-static dedup gate: the streamed anti-join drops
    exactly the indexed fingerprints and agrees row-for-row with the
    batch formulation; null-text rows survive (null fingerprints never
    match — the anti-join contract)."""
    from providenciasbigdata_spark import streaming as st
    from providenciasbigdata_spark.functions.text import content_fingerprint

    rows = [
        (1, "the same text", "en", "s", 13),
        (2, "The  Same   TEXT", "en", "s", 16),   # normalizes to doc 1
        (3, "something new", "en", "s", 13),
        (4, None, "en", "s", 0),                   # null text survives
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    index = docs.filter("doc_id = 1").select(
        content_fingerprint(F.col("text")).alias("content_hash")
    )

    batch = st.dedup_against_index(docs, index).select("doc_id")
    got_batch = sorted(r.doc_id for r in batch.collect())
    assert got_batch == [3, 4]  # 1 and 2 are indexed content; null survives

    streamed = st.run_available_now(
        st.dedup_against_index(st.documents_stream(spark, src), index).select(
            "doc_id"
        ),
        "dedup_idx_parity",
        output_mode="append",
    )
    assert sorted(r.doc_id for r in streamed.collect()) == got_batch
