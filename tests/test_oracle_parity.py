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


def _dtype_class(dtype) -> str:
    """Collapse pandas dtypes into the classes the driver's value-hash
    distinguishes: int64 vs float64 hash differently even when every
    value is numerically equal (the r03 HUGEINT->float64 red rows), so
    the local gate must treat a kind mismatch as failure. object /
    string variants collapse together (both sides stringify the same)."""
    kind = dtype.kind  # i u f b M m O U S
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in ("M", "m"):
        return "datetime"
    return "object"


@pytest.mark.parametrize("name,fn,sql", _WITH_ORACLE, ids=[n for n, _, _ in _WITH_ORACLE])
def test_oracle_parity(spark, duck01, name, fn, sql):
    from pyspark.sql import types as T

    sdf = fn(spark, SF)
    banned = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]
    assert not banned, (
        f"{name}: oracle-checked queries must not return Array/Map "
        f"top-level columns {banned} — the driver's pandas canonicalizer "
        "crashes on unhashable cells (r03 array_agg_users); serialize "
        "with array_join/to_json on both sides"
    )
    got = sdf.toPandas()
    want = duck01.execute(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    dtype_diffs = {
        c: (str(got[c].dtype), str(want[c].dtype))
        for c in sorted(set(got.columns) & set(want.columns))
        if _dtype_class(got[c].dtype) != _dtype_class(want[c].dtype)
    }
    assert not dtype_diffs, (
        f"{name}: dtype class mismatch (spark, oracle): {dtype_diffs} — "
        "the driver's value-hash is dtype-sensitive; cast both sides "
        "(integer SUMs in DuckDB return HUGEINT -> pandas float64: wrap "
        "in CAST(... AS BIGINT))"
    )
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
