"""Time-series subsequence search: the distributed applyInPandas path
must agree exactly with a single-machine numpy brute force, and an
exact subsequence of the data must match at distance ~0."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators.tsmatch import znorm_pattern_topk

SF = "/root/testdata/sf0.001"


def _brute(pdf: pd.DataFrame, pattern, k, by="user_id"):
    qn = (np.asarray(pattern, float) - np.mean(pattern)) / np.std(pattern)
    L = len(qn)
    rows = []
    for key, g in pdf.groupby(by):
        g = g.sort_values("ts", kind="mergesort")
        v = g["value"].to_numpy(float)
        ts = g["ts"].to_numpy()
        for i in range(len(v) - L + 1):
            w = v[i : i + L]
            sd = w.std()
            if sd == 0:
                continue
            z = (w - w.mean()) / sd
            rows.append((key, ts[i], round(float(np.sqrt(((z - qn) ** 2).sum())), 6)))
    rows.sort(key=lambda r: (r[2], r[0], r[1]))
    return rows[:k]


def test_pattern_topk_matches_numpy_brute(spark):
    ev = load_table(spark, SF, "events")
    pattern = list(range(8))
    got = [
        (r.user_id, r.start_ts.to_pydatetime() if hasattr(r.start_ts, "to_pydatetime") else r.start_ts, r.dist)
        for r in znorm_pattern_topk(ev, pattern, k=10).collect()
    ]
    pdf = ev.select("user_id", "ts", "value").toPandas()
    want = _brute(pdf, pattern, k=10)
    assert [(u, d) for u, _t, d in got] == [(u, d) for u, _t, d in want]
    assert [t for _u, t, _d in got] == [pd.Timestamp(t).to_pydatetime() for _u, t, _d in want]


def test_pattern_topk_finds_planted_exact_match(spark):
    """Plant a scaled/shifted copy of the pattern into a synthetic
    series: z-normalization must surface it at distance 0, rank 1."""
    base = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    # amplitude x5, offset +100 — shape identical
    planted = [100 + 5 * x for x in base]
    noise = [7.0, 7.5, 6.0, 8.0, 9.0, 5.0, 4.0, 3.0, 2.0, 1.0]
    rows = [
        (1, (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)).to_pydatetime(),
         float(v))
        for i, v in enumerate(noise + planted + noise)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    top = znorm_pattern_topk(df, base, k=1).first()
    assert top.dist == 0.0
    assert top.start_ts == pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=10)


def test_pattern_topk_rejects_constant_pattern_and_short_series(spark):
    df = spark.createDataFrame(
        [(1, pd.Timestamp("2024-01-01").to_pydatetime(), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="constant"):
        znorm_pattern_topk(df, [2.0, 2.0, 2.0])
    # series shorter than the pattern -> empty result, no crash
    assert znorm_pattern_topk(df, [1.0, 2.0, 3.0], k=5).count() == 0
