"""Registry invariants: the external gate samples the first N entries
of ``all_queries()``, so ordering and metadata are contracts, not
conveniences."""

from __future__ import annotations

from providenciasbigdata_spark.queries import all_queries, why_no_oracle


def test_oracle_backed_entries_precede_rows_only():
    """The gate's sampled prefix must be 100% value-hash-verifiable:
    every oracle-backed entry sorts before every rows-only entry."""
    flags = [sql is None for _, (_fn, sql) in all_queries().items()]
    first_rows_only = flags.index(True) if True in flags else len(flags)
    assert all(flags[first_rows_only:]), (
        "rows-only entries interleaved with oracle-backed ones — the gate "
        "window would sample hash-uncheckable queries"
    )


def test_every_rows_only_entry_has_a_reason():
    rows_only = {n for n, (_fn, sql) in all_queries().items() if sql is None}
    reasons = why_no_oracle()
    missing = rows_only - reasons.keys()
    stale = reasons.keys() - rows_only
    assert not missing, f"rows-only entries without why_no_oracle: {missing}"
    assert not stale, f"why_no_oracle keys not rows-only (or gone): {stale}"
    assert all(len(v) > 20 for v in reasons.values()), "reasons must be substantive"


def test_registry_order_is_deterministic():
    a = list(all_queries())
    b = list(all_queries())
    assert a == b
