"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``providenciasbigdata_spark``; this file is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from providenciasbigdata_spark.queries import all_queries  # noqa: E402
from providenciasbigdata_spark.queries import why_no_oracle as _why  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's anchored
    similarity-neighborhood (SURVEY.md A10) — build the SIMILAR edges
    from embeddings, expand 1 hop from P-7, weight in [0,100]."""
    fn, _ = all_queries()["a10_neighborhood"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}


def why_no_oracle() -> dict[str, str]:
    """Machine-readable reason per rows-only query (every queries()
    entry absent from oracle_sql()): distinguishes "approximation /
    non-SQL-expressible, property-tested in pytest" from "unverified".
    Exhaustiveness is pinned by tests/test_registry.py."""
    return _why()
