"""Local emulation of the driver's DuckDB-oracle gate.

For every declared query with an oracle: run the Spark DataFrame and the
DuckDB SQL at sf=0.01 (the driver's correctness tier), then compare
row count, column names, and exact values order-insensitively — the
strictest reading of the driver's value-hash compare.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from providenciasbigdata_spark.queries import all_queries

SF = "/root/testdata/sf0.01"

_ALL = all_queries()
_WITH_ORACLE = [(n, fn, sql) for n, (fn, sql) in _ALL.items() if sql is not None]
_ROWS_ONLY = [(n, fn) for n, (fn, sql) in _ALL.items() if sql is None]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df):
    """Sort columns by name, rows by string repr — order-insensitive."""
    df = df[sorted(df.columns)]

    def key_of(row):
        return tuple(_canon(v) for v in row)

    rows = sorted((key_of(r) for r in df.itertuples(index=False)), key=repr)
    return list(df.columns), rows


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:
        import numpy as np

        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return _canon(float(v))
        if isinstance(v, np.ndarray):
            return tuple(_canon(x) for x in v)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


@pytest.mark.parametrize("name,fn,sql", _WITH_ORACLE, ids=[n for n, _, _ in _WITH_ORACLE])
def test_oracle_parity(spark, duck01, name, fn, sql):
    got = fn(spark, SF).toPandas()
    want = duck01.execute(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    gcols, grows = _normalize(got)
    wcols, wrows = _normalize(want)
    assert gcols == wcols, f"{name}: columns {gcols} != oracle {wcols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(grows, wrows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name,fn", _ROWS_ONLY, ids=[n for n, _ in _ROWS_ONLY])
def test_rows_only_queries_run(spark, name, fn):
    df = fn(spark, SF)
    assert df.count() >= 0  # must execute cleanly with a stable schema
    assert len(df.columns) > 0
