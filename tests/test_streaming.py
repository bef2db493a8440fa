"""Structured Streaming: batch/stream parity via availableNow trigger.

The events fixture's ts column is Parquet NANOS (io.load_table rebuilds
micros); for the file-source stream we re-write a micros-typed copy to
a tmp dir once per session and stream from there.
"""

from __future__ import annotations

import pytest

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
    ],
)
def test_stream_matches_batch(spark, events_dir, fn, cols, output_mode):
    batch = fn(load_table(spark, SF, "events"))
    stream = fn(streaming.events_stream(spark, events_dir))
    assert stream.isStreaming
    name = f"t_{fn.__name__}"
    got = streaming.run_available_now(stream, name, output_mode=output_mode)
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
