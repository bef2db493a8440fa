"""Process-wide staging event log (round 13, verdict-r12 item 4).

Several registry queries read from /tmp-staged copies of the fixture
tables (format conversions, mongodump export, streaming file sources,
the similarity-edges scaffold, the IVF index). The staging helpers
build those copies lazily, once per (fixture vintage, shape) — which
means the FIRST caller after a fixture regeneration pays a one-off
write that has nothing to do with the plan under test: the r12 driver
bench window read ``mongodump_facet_anio`` at 3.27x purely because the
re-stage landed inside its timed region.

Every staging helper wraps the build it actually PERFORMS (cache
misses only — a hit records nothing) in :func:`stage`, appending
``{"path", "sec"}`` to the module-global :data:`EVENTS`. ``bench.py``
snapshots the log around each timed attempt and records which queries
paid a staging write in ``BENCH_DETAIL.json`` (``staged``), so a
staging-inflated reading is machine-attributed by the artifact itself
instead of adjudicated from timings.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

EVENTS: list[dict] = []


@contextmanager
def stage(path: str):
    """Record a performed staging build: wrap ONLY the miss branch
    (``if not exists _SUCCESS:``) so cache hits stay silent."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        EVENTS.append(
            {
                "path": os.path.basename(str(path).rstrip("/")),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
