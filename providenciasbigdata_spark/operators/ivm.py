"""Incremental view maintenance (IVM) for joins and aggregates: keep a
materialized join/rollup current under insert-only deltas WITHOUT
re-joining history (round 6).

The algebra (classic delta rules, e.g. Griffin & Libkin SIGMOD'95;
the same identity DBSP/Materialize evaluate continuously):

    (A ∪ dA) ⋈ (B ∪ dB)
      = (A ⋈ B)  ∪  (dA ⋈ B)  ∪  (A ⋈ dB)  ∪  (dA ⋈ dB)

so the REFRESH work is three joins whose smaller side is a delta —
at 100 TB the old state is never rescanned against itself: each delta
term broadcasts (daily deltas are orders of magnitude smaller than
history), and the previous join materialization is reused as-is. The
equality to the from-scratch join is exactly what the registry oracle
hash-checks (``ivm_incremental_join_revenue``).

Scope: insert-only deltas and inner equi-joins — the append-only
ingest shape of a training-data pipeline (updates/deletes route
through operators.cdc / snapshots versioning instead, where keys
carry version order). ``merge_agg_state`` in operators/cdc.py is the
aggregate sibling of this module.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    old_a: DataFrame,
    old_b: DataFrame,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    on: Sequence[str],
    broadcast_deltas: bool = True,
) -> DataFrame | None:
    """The DELTA of ``(A ∪ dA) INNER-JOIN (B ∪ dB)`` relative to
    ``A ⋈ B``: the three delta terms unioned. Returns None when both
    deltas are None/empty-by-construction. ``broadcast_deltas`` hints
    the delta side of each term (the 100 TB default — a delta that is
    NOT broadcastable should be rare enough to flip the flag rather
    than silently shuffling history)."""
    on = list(on)
    hint = F.broadcast if broadcast_deltas else (lambda df: df)
    terms = []
    if delta_a is not None:
        terms.append(hint(delta_a).join(old_b, on, "inner"))
    if delta_b is not None:
        terms.append(old_a.join(hint(delta_b), on, "inner"))
    if delta_a is not None and delta_b is not None:
        terms.append(hint(delta_a).join(hint(delta_b), on, "inner"))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def refresh_join(
    old_join: DataFrame,
    old_a: DataFrame,
    old_b: DataFrame,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    on: Sequence[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The refreshed materialization: previous join state (reused
    as-is, typically a parquet read of the prior run's output) plus
    the delta terms. Column order follows ``old_join``."""
    d = join_delta(old_a, old_b, delta_a, delta_b, on, broadcast_deltas)
    if d is None:
        return old_join
    return old_join.unionByName(d.select(*old_join.columns))
